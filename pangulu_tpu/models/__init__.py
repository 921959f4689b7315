from pangulu_tpu.models.generators import (
    arrowhead,
    poisson2d,
    poisson3d,
    random_unsymmetric,
    smallworld,
    trefethen,
)

__all__ = [
    "trefethen",
    "poisson2d",
    "poisson3d",
    "random_unsymmetric",
    "arrowhead",
    "smallworld",
]
