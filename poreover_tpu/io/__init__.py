from .trace import (
    load_logits,
    logit_to_log_likelihood,
    model_from_trace,
    softmax,
    trace_from_flappie,
    trace_from_guppy,
)

__all__ = [
    "load_logits",
    "logit_to_log_likelihood",
    "model_from_trace",
    "softmax",
    "trace_from_flappie",
    "trace_from_guppy",
]
