from hommx_tpu.models.fem import LinearElasticityFEM, PoissonFEM
from hommx_tpu.models.hmm import (
    BaseHMM,
    LinearElasticityHMM,
    LinearElasticityStratifiedHMM,
    PoissonHMM,
    PoissonStratifiedHMM,
)
from hommx_tpu.models.periodic import (
    BasePeriodicHMM,
    ElasticityPeriodicHMM,
    PoissonPeriodicHMM,
)

__all__ = [
    "PoissonFEM",
    "LinearElasticityFEM",
    "BaseHMM",
    "PoissonHMM",
    "PoissonStratifiedHMM",
    "LinearElasticityHMM",
    "LinearElasticityStratifiedHMM",
    "BasePeriodicHMM",
    "PoissonPeriodicHMM",
    "ElasticityPeriodicHMM",
]
