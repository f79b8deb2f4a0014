"""Audit the compiled HLO for collectives inside scan loops under TP.

VERDICT r3 item 4: tensor parallelism was correctness-proven but perf-
blind — the round-3 TP_RULES sharded the AR decoder's per-step matmuls
(prenet/Q/attention_proj/content_Q/fc_out, decoder_rnn wx/wh) on their
output dim, which forces an all-gather of the carried activation inside
the 300-step lax.scan: 300+ serial ICI round trips per forward, each
amortizing a matmul of a few hundred KFLOPs. This tool compiles the
flagship forward on a 1x2 (data x model) virtual CPU mesh, walks the
optimized HLO, and reports collective counts split by whether they sit
inside a while loop (= scan) body. The TP design rule it enforces:

    time-batched weights may shard (one amortized collective per
    forward); scan-carried computation must stay replicated.

tests/test_tp_collectives.py pins the current TP_RULES to ZERO in-loop
collectives. README "Tensor parallelism: when it helps" documents the
recommendation this audit backs.

Run (no TPU needed):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
        python tools/audit_tp_hlo.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVES = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


def split_computations(hlo_text: str) -> dict[str, str]:
    """Computation name -> body text, from an HLO module dump."""
    comps: dict[str, str] = {}
    name = None
    lines: list[str] = []
    for line in hlo_text.splitlines():
        m = re.match(r"^(?:ENTRY\s+)?%?([\w\.\-]+)\s*\([^)]*\)\s*->.*{", line)
        if m:
            name = m.group(1)
            lines = []
            continue
        if name is not None:
            if line.startswith("}"):
                comps[name] = "\n".join(lines)
                name = None
            else:
                lines.append(line)
    return comps


def while_body_names(comps: dict[str, str]) -> set[str]:
    """Names of computations reachable from any while instruction's body
    or condition (transitively, so nested calls/fusions count)."""
    roots: set[str] = set()
    for body in comps.values():
        for m in re.finditer(r"(?:body|condition)=%?([\w\.\-]+)", body):
            roots.add(m.group(1))
    # transitive closure over called computations
    seen = set()
    frontier = [r for r in roots if r in comps]
    while frontier:
        cur = frontier.pop()
        if cur in seen:
            continue
        seen.add(cur)
        for m in re.finditer(
            r"(?:calls|to_apply|body|condition|branch_computations)="
            r"(?:{([^}]*)}|%?([\w\.\-]+))",
            comps.get(cur, ""),
        ):
            names = m.group(1).split(",") if m.group(1) else [m.group(2)]
            for n in names:
                n = n.strip().lstrip("%")
                if n in comps and n not in seen:
                    frontier.append(n)
    return seen


def count_collectives(hlo_text: str) -> dict:
    comps = split_computations(hlo_text)
    in_loop = while_body_names(comps)
    counts = {"in_loop": {}, "outside": {}}
    for name, body in comps.items():
        bucket = counts["in_loop" if name in in_loop else "outside"]
        for op in COLLECTIVES:
            n = len(re.findall(rf"{op}(?:-start|-done)?\(", body)) + len(
                re.findall(rf"= \S+ {op}", body)
            )
            if n:
                bucket[op] = bucket.get(op, 0) + n
    counts["in_loop_total"] = sum(counts["in_loop"].values())
    counts["outside_total"] = sum(counts["outside"].values())
    return counts


def compile_forward_tp(n_model: int = 2):
    """Compile the flagship forward under TP on a virtual 1 x n mesh and
    return the optimized HLO text."""
    import jax
    import jax.numpy as jnp

    from lip2speech_tpu.config import Config, ModelConfig
    from lip2speech_tpu.models import Lip2Speech
    from lip2speech_tpu.parallel import (
        batch_sharding,
        create_mesh,
        partition_params,
        shard_pytree,
    )

    assert len(jax.devices()) >= n_model, (
        f"need {n_model} devices; run with JAX_PLATFORMS=cpu "
        f"XLA_FLAGS=--xla_force_host_platform_device_count={n_model}"
    )
    mesh = create_mesh(n_data=1, n_model=n_model,
                       devices=jax.devices()[:n_model])

    # small variant, but a REAL 16-step AR scan + banks + trunk conv_last
    cfg = Config(
        model=ModelConfig(
            ffn_hidden_dim=128,
            content_vocab_size=33,
            content_latent_dim=64,
            max_decoder_steps=16,
            postnet_embedding_dim=64,
            shufflenet_width=0.5,
        )
    )
    model = Lip2Speech(cfg.model)
    b = 2
    video = jnp.zeros((b, 5, 32, 32, 3))
    mel = jnp.zeros((b, 80, 12))
    spk = jnp.zeros((b, 256))
    rngs = {
        "gumbel": jax.random.PRNGKey(1),
        "teacher": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, video, None, mel, 0.5, spk, rngs
    )
    specs = partition_params(variables["params"], mesh, tensor_parallel=True)
    sharded = {
        "params": shard_pytree(variables["params"], mesh, specs),
        "batch_stats": jax.device_put(
            variables["batch_stats"],
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        ),
    }
    sv = jax.device_put(video, batch_sharding(mesh))
    sm = jax.device_put(mel, batch_sharding(mesh))
    ss = jax.device_put(spk, batch_sharding(mesh))

    def fwd(vars_, v, m, s):
        out = model.apply(vars_, v, None, m, 1.0, s, rngs, train=False)
        return out["mel_postnet"], out["gate"]

    compiled = jax.jit(fwd).lower(sharded, sv, sm, ss).compile()
    return compiled.as_text()


def main():
    import json

    hlo = compile_forward_tp(2)
    counts = count_collectives(hlo)
    print(json.dumps(counts, indent=2))
    if counts["in_loop_total"]:
        print(
            "\nWARNING: collectives inside scan bodies — TP_RULES shard a "
            "scan-carried weight; every AR step pays a serial ICI round trip."
        )
        return 1
    print("\nOK: no collectives inside scan bodies "
          f"({counts['outside_total']} amortized outside).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
