from chrono_tpu.solver import descriptor, direct, projection, vi
from chrono_tpu.solver.vi import solve_apgd, solve_bb, solve_pjacobi, solve_admm, VISolution
