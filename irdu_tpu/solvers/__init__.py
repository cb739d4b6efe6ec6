"""L2 solvers: unrolled CG/ADMM iteration stacks over the L1 graph ops."""

from irdu_tpu.solvers.gtv_glr import MixtureGTVGLR
