from .core import (
    Conv,
    ConvTranspose,
    InstanceNorm,
    max_pool,
    relu,
    leaky_relu,
    sigmoid,
    count_params,
    flatten_params,
    unflatten_params,
)
from . import generators, discriminators, losses, schedulers
