/* Native JPEG decoder for the host data loader.
 *
 * The training corpora store each clip as a bz2-pickled list of encoded
 * JPEG frames (reference datasets/lrw/dataset.py:20-24). The hot host-side
 * work is JPEG decode; this module decodes a frame directly into a
 * caller-provided RGB buffer using libjpeg, with no Python objects touched
 * so ctypes calls release the GIL and loader threads decode in parallel.
 *
 * Build: gcc -O3 -shared -fPIC jpegstack.c -ljpeg -o _jpegstack.so
 */

#include <stddef.h>
#include <stdio.h>

#include <jpeglib.h>
#include <setjmp.h>
#include <stdint.h>
#include <string.h>

struct error_ctx {
    struct jpeg_error_mgr mgr;
    jmp_buf jump;
};

static void on_error(j_common_ptr cinfo) {
    struct error_ctx *ctx = (struct error_ctx *)cinfo->err;
    longjmp(ctx->jump, 1);
}

/* Decode one JPEG into out (h*w*3 RGB). Returns 0 on success, -1 decode
 * error, -2 dimension mismatch. If h/w are 0 they are written back via
 * out_h/out_w probing mode (out may be NULL then). */
int decode_jpeg_rgb(const uint8_t *buf, long len, uint8_t *out, int h, int w) {
    struct jpeg_decompress_struct cinfo;
    struct error_ctx err;

    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = on_error;
    if (setjmp(err.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }

    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);

    if ((int)cinfo.output_height != h || (int)cinfo.output_width != w) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }

    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + (size_t)cinfo.output_scanline * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* Probe dimensions without decoding. Returns 0 on success. */
int probe_jpeg(const uint8_t *buf, long len, int *h, int *w) {
    struct jpeg_decompress_struct cinfo;
    struct error_ctx err;

    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = on_error;
    if (setjmp(err.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    *h = (int)cinfo.image_height;
    *w = (int)cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* Decode a whole stack of concatenated JPEGs (offsets[i]..offsets[i+1])
 * into out (n*h*w*3), sequential within the call; callers parallelize
 * across clips. Returns number of frames decoded or negative error. */
int decode_jpeg_stack(const uint8_t *blob, const int64_t *offsets, int n,
                      uint8_t *out, int h, int w) {
    for (int i = 0; i < n; i++) {
        const uint8_t *p = blob + offsets[i];
        long len = (long)(offsets[i + 1] - offsets[i]);
        int rc = decode_jpeg_rgb(p, len, out + (size_t)i * h * w * 3, h, w);
        if (rc != 0) return rc;
    }
    return n;
}
