"""hommx_tpu — a TPU-native Heterogeneous Multiscale Method (HMM) framework.

A from-scratch rebuild of the capabilities of the reference package
``flxrcz/hommx`` (see /root/reference, SURVEY.md) as a pure JAX/XLA/Pallas
pipeline with zero DOLFINx/PETSc/MPI dependency.

Architecture (TPU-first, NOT a port):

The reference solves, per macro cell T, one small periodic FEM "cell problem"
per macro basis function through PETSc (reference ``hmm.py:310-369``).  Each of
those right-hand sides is linear in the (constant) gradient of the macro basis
function, so the correctors span a space of dimension d (scalar problems) or
d(d+1)/2 (elasticity).  hommx_tpu therefore factors the entire HMM into

    1. a *micro stage*: for every macro quadrature point c_T, assemble the
       reduced (periodicity-folded) cell operator as a weighted Gram matrix
       ``K = Dᵀ diag(w·A(c_T, y_q)) D`` (pure matmuls → MXU), Cholesky-factor
       once, solve d (or d(d+1)/2) right-hand sides, and contract the corrected
       gradient fields into the per-cell homogenized tensor A*(c_T);
    2. a *macro stage*: standard P1 FEM assembly with the element-wise constant
       coefficient A*(c_T) (segment-scatter into an ELL sparse matrix) and a
       preconditioned-CG / dense-Cholesky solve.

This is numerically identical to the reference algorithm (same S_loc up to
solver tolerance) but runs as one jitted, vmapped, shard_map-shardable program
over the macro-cell batch.

Public API mirrors the reference surface (reference ``src/hommx/hmm.py``):
``PoissonHMM``, ``PoissonStratifiedHMM``, ``LinearElasticityHMM``,
``LinearElasticityStratifiedHMM``, ``BasePeriodicHMM``, ``PoissonPeriodicHMM``,
plus mesh/FEM helpers.
"""

from hommx_tpu import config as _config  # noqa: F401  (sets x64 default policy)
from hommx_tpu.meshes import (
    SimplexMesh,
    create_box,
    create_interval,
    create_rectangle,
    create_unit_cube,
    create_unit_square,
    mesh_from_delaunay,
    mesh_from_file,
    rescale_mesh,
)
from hommx_tpu.models.fem import PoissonFEM, LinearElasticityFEM
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
from hommx_tpu.ops.function_space import (
    DirichletBC,
    Function,
    FunctionSpace,
    dirichletbc,
    functionspace,
    locate_dofs_geometrical,
)
from hommx_tpu.utils.options import SolverOptions

__version__ = "0.1.0"

__all__ = [
    "SimplexMesh",
    "create_box",
    "create_interval",
    "create_rectangle",
    "create_unit_cube",
    "create_unit_square",
    "mesh_from_delaunay",
    "mesh_from_file",
    "rescale_mesh",
    "BaseHMM",
    "PoissonHMM",
    "PoissonStratifiedHMM",
    "LinearElasticityHMM",
    "LinearElasticityStratifiedHMM",
    "BasePeriodicHMM",
    "PoissonPeriodicHMM",
    "ElasticityPeriodicHMM",
    "PoissonFEM",
    "LinearElasticityFEM",
    "FunctionSpace",
    "Function",
    "DirichletBC",
    "functionspace",
    "dirichletbc",
    "locate_dofs_geometrical",
    "SolverOptions",
]
