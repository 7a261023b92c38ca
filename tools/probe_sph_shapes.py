import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update('jax_platforms','cpu')
import chrono_tpu.ops.pallas.sph_sym_kernel as K
orig = K._sym_sweep
def traced(feat, edge_fwd, **kw):
    a = kw.get('active')
    print('SWEEP active', None if a is None else a.shape, 'hold', kw.get('hold_map'), 'feat', feat.shape, flush=True)
    return orig(feat, edge_fwd, **kw)
K._sym_sweep = traced
import chrono_tpu.fsi.sph.pencil as P
_mk = P.make_sph_advance_pencil
def mk2(*a, **kw):
    kw['interpret'] = True
    return _mk(*a, **kw)
P.make_sph_advance_pencil = mk2
import bench_suite as B
B.make_sph_advance_pencil = mk2
os.environ.setdefault('SUITE_SPH_C8','0')
os.environ.setdefault('SUITE_N','30000')
os.environ.setdefault('SUITE_CYCLES','1')
os.environ.setdefault('SUITE_CPU','1')
import bench_suite
print(bench_suite.bench_sph())
