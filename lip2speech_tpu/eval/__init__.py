from lip2speech_tpu.eval.evaluate import evaluate_net  # noqa: F401
