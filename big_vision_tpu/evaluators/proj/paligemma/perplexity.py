"""Masked-CE perplexity evaluator for prefix-LM models.

Parity target: reference evaluators/proj/paligemma/perplexity.py:30-63 —
a thin specialization of the mean evaluator over a predict_fn that returns
per-example masked NLL (the trainer provides pred="perplexity").
"""

from big_vision_tpu.evaluators import mean

API = "jit"

Evaluator = mean.Evaluator
