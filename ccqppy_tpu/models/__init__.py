"""Solver suite: functional, jit-compiled, vmappable QP solvers.

Each solver module exposes ``solve(A, b, x0=None, proj=None, config=...)``
returning a ``SolveResult`` pytree.  ``SOLVERS`` maps short names to
(solve_fn, config_cls) for benchmark harnesses and the compat layer.
"""
from ccqppy_tpu.models import apgd, bbpgd, direct, mprgp, pcg, pgd, spg
from ccqppy_tpu.models.apgd import APGDConfig, APGDSCConfig
from ccqppy_tpu.models.base import SolveResult, SolverConfig, pg_residual
from ccqppy_tpu.models.bbpgd import BBPGDConfig, BBPGDfConfig
from ccqppy_tpu.models.direct import (direct_x0, solve_direct_batched,
                                      spd_inverse_batch)
from ccqppy_tpu.models.mprgp import MPRGPBBConfig, MPRGPConfig
from ccqppy_tpu.models.pcg import PCGConfig
from ccqppy_tpu.models.pgd import PGDConfig
from ccqppy_tpu.models.spg import SPGConfig

SOLVERS = {
    "pgd": (pgd.solve, PGDConfig),
    "apgd": (apgd.solve, APGDConfig),
    "apgd_ar": (apgd.solve_anti_relaxation, APGDConfig),
    "apgd_sc": (apgd.solve_sc, APGDSCConfig),
    "bbpgd": (bbpgd.solve, BBPGDConfig),
    "bbpgd_f": (bbpgd.solve_fallback, BBPGDfConfig),
    "spg": (spg.solve, SPGConfig),
    "mprgp": (mprgp.solve, MPRGPConfig),
    "mprgp_bb": (mprgp.solve_bb, MPRGPBBConfig),
    "pcg": (pcg.solve, PCGConfig),
}

__all__ = [
    "SOLVERS", "SolveResult", "SolverConfig", "pg_residual",
    "pgd", "apgd", "bbpgd", "spg", "mprgp", "pcg",
    "PGDConfig", "APGDConfig", "BBPGDConfig", "BBPGDfConfig",
    "SPGConfig", "MPRGPConfig", "MPRGPBBConfig", "PCGConfig",
]
