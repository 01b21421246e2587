import time
import numpy as np
import jax, jax.numpy as jnp
from esrganplus_tpu.models import RRDBNetConfig, init_rrdbnet
from esrganplus_tpu.models.rrdb import _rdb_forward, _init_rdb
from esrganplus_tpu.kernels.rdb_t import prepare_rdb_t_weights, rdb_t

cfg = RRDBNetConfig()
B, H, W = 8, 128, 128
p = _init_rdb(jax.random.PRNGKey(3), cfg, 0.1, jnp.float32)
x = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, cfg.nf), jnp.float32) * 0.5

# reference: naive XLA RDB in f32 and bf16
ref32 = _rdb_forward(x, p, cfg, jax.random.PRNGKey(0), False, None)
ref16 = _rdb_forward(x, p, cfg, jax.random.PRNGKey(0), False, jnp.bfloat16)

ws = prepare_rdb_t_weights(p, cfg.nf, cfg.gc, cfg.conv1x1)
xt = x.astype(jnp.bfloat16).transpose(0, 3, 1, 2).reshape(B, cfg.nf, H * W)
out_t = rdb_t(xt, *ws, nf=cfg.nf, gc=cfg.gc, h=H, w=W)
out = np.asarray(out_t.reshape(B, cfg.nf, H, W).transpose(0, 2, 3, 1), np.float32)

print("kernel vs f32 ref  max abs:", np.abs(out - np.asarray(ref32, np.float32)).max())
print("kernel vs bf16 ref max abs:", np.abs(out - np.asarray(ref16, np.float32)).max())
print("bf16 ref vs f32    max abs:", np.abs(np.asarray(ref16, np.float32) - np.asarray(ref32, np.float32)).max())

# --- speed: chain the kernel 69x (one trunk's worth of RDBs) ---
def chain(xt):
    acc = xt
    for _ in range(69):
        acc = rdb_t(acc, *ws, nf=cfg.nf, gc=cfg.gc, h=H, w=W)
    return acc[0, 0, 0].astype(jnp.float32)
jc = jax.jit(chain)
_ = float(np.asarray(jc(xt)))
ts = []
for _ in range(3):
    t0 = time.perf_counter(); _ = float(np.asarray(jc(xt))); ts.append(time.perf_counter() - t0)
dt = sorted(ts)[1]
print(f"69x rdb_t: {dt*1000:.1f} ms total (incl ~30ms RTT) -> {(dt-0.03)/69*1000:.3f} ms/RDB")
