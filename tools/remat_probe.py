"""Train-step time under different remat policies (830M, one chip)."""
import sys, time
t00=time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0,'/root/repo')
from ssr_speech_tpu.config import SSRModelConfig, TrainConfig, OptimConfig
from ssr_speech_tpu.models import ssr as ssr_model, transformer as trf
from ssr_speech_tpu.training import optim as optimlib
from ssr_speech_tpu.training.trainer import make_train_step

policy_name = sys.argv[1] if len(sys.argv) > 1 else "none"
if policy_name != "none":
    trf.REMAT_POLICY = getattr(jax.checkpoint_policies, policy_name)

cfg = SSRModelConfig(d_model=2048, nhead=16, num_layers=16, n_codebooks=4, text_vocab_size=120)
tcfg = TrainConfig(precision="bfloat16", optim=OptimConfig(optimizer_name="scaledadam", clipping_scale=2.0))
params = ssr_model.init_ssr(jax.random.PRNGKey(0), cfg)
opt, _ = optimlib.build_optimizer(tcfg.optim)
opt_state = opt.init(params)
step = make_train_step(cfg, tcfg, opt)
rng = np.random.default_rng(0)
B, sx, sy = 4, 192, 1024
ts = cfg.tokens
batch = dict(
    x=rng.integers(0, cfg.text_vocab_size, size=(B,sx)).astype(np.int32),
    x_lens=np.full(B, sx, np.int32),
    y=rng.integers(0, ts.audio_vocab_size, size=(B,sy,4)).astype(np.int32),
    y_lens=np.full(B, sy, np.int32))
log(f"setup done policy={policy_name}")
params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(1))
_ = float(m["loss"]); log("compiled")
t0=time.time(); n=10
for i in range(n):
    params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(i))
_ = float(m["loss"])
el=(time.time()-t0)/n
log(f"policy={policy_name}: train step {el*1000:.1f} ms, {B*sy/el:.0f} codec tokens/s")
