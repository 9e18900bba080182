"""ccqppy_tpu — a TPU-native convex-constrained QP solver framework.

Solves  min_x  1/2 x^T A x + b^T x   s.t.  x in Omega
(Omega a closed convex set given by a projection operator), with the full
capability surface of the reference CCQPpy library re-designed for TPUs:

* ``ccqppy_tpu.ops``      — projection-operator algebra + linear operators
                            (dense / block-sparse / mesh-sharded).
* ``ccqppy_tpu.models``   — the solver suite: PGD, APGD, APGD-AR, BBPGD,
                            BBPGDf, SPG, MPRGP, MPRGP-BB as jit-compiled
                            ``lax.while_loop`` kernels, plus PCG (projected
                            CG with active-set restarts, TPU-native).
* ``ccqppy_tpu.parallel`` — scenario batching (vmap/shard_map), the
                            row-sharded single-huge-QP path, and the
                            bf16->f32 mixed-precision ensemble pipeline.
* ``ccqppy_tpu.utils``    — oracle problems, random QP ensembles, benchmark
                            harness, plotting.
* ``ccqppy_tpu.compat``   — drop-in class API mirroring the reference
                            (``CCQPSolverBBPGD(...).solve(A, b, ...)``).

Gradient convention: ``g = A x + b`` (the reference's executable convention;
see SURVEY.md section 2.5).
"""

__version__ = "0.1.0"

from ccqppy_tpu import models, ops, parallel, utils  # noqa: F401
from ccqppy_tpu.models import (SOLVERS, SolveResult, apgd, bbpgd, mprgp, pgd,
                               spg)  # noqa: F401
from ccqppy_tpu.ops import projections  # noqa: F401
from ccqppy_tpu.ops.linop import (BlockSparseOperator, CastDense,
                                  DenseOperator, FastDense, MixedPrecDense,
                                  ShardedDenseOperator, SymmetricPackedDense,
                                  as_operator)  # noqa: F401
from ccqppy_tpu.ops.projections import (BallProj, BlockwiseProj, BoxProj,
                                        IdentityProj, LorentzConeProj,
                                        LowerBoundProj, ProductProj,
                                        SegmentProj, UpperBoundProj, ball,
                                        blockwise, box, identity,
                                        lorentz_cone, lower_bound,
                                        segment_product,
                                        upper_bound)  # noqa: F401
