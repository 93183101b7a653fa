from gabby_tpu.eval.ppl import evaluate_ppl, ppl_from_tokens  # noqa: F401
