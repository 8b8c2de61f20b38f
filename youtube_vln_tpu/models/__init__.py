from .vilbert import (  # noqa: F401
    init_lily_params,
    lily_forward,
    bert_model,
    param_count,
)
from . import torch_io  # noqa: F401
