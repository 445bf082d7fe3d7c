"""Worker for the 2-process multi-host integration test (not a pytest module).

Each process: jax.distributed.initialize over localhost, 2 virtual CPU devices
per process (global mesh of 4), rank-sharded loader batch, SPMD XE train step
with cross-process gradient psum. Prints the step loss for the parent test to
compare across processes and against the single-process ground truth.

Usage: python tests/_multihost_worker.py <process_id> <coordinator_port>
"""
import os
import pathlib
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from on_device_image_captioning_tpu.config import CaptionerConfig  # noqa: E402
from on_device_image_captioning_tpu.models import captioner as cap  # noqa: E402
from on_device_image_captioning_tpu.parallel import mesh as pm  # noqa: E402
from on_device_image_captioning_tpu.train import train_step  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

cfg = CaptionerConfig(
    d_model=32, N_enc=1, N_dec=1, ff=64, num_heads=4, num_exp_enc_list=(4,),
    num_exp_dec=4, vocab_size=32, max_seq_len=12, img_feature_dim=8,
    sos_idx=2, eos_idx=3, pad_idx=0, unk_idx=1,
)
params = cap.captioner_init(jax.random.PRNGKey(0), cfg)  # same seed every host
opt = optax.adam(1e-3)
state = train_step.init_train_state(params, opt)

mesh = pm.make_default_mesh(4)
assert mesh.shape["data"] == 4, dict(mesh.shape)
state = pm.shard_train_state(state, mesh)

# rank shard of the deterministic global batch: rows [2*pid, 2*pid+1] of 4
rng = np.random.default_rng(0)
feats = rng.standard_normal((4, 5, cfg.img_feature_dim), dtype=np.float32)
caps_arr = rng.integers(1, cfg.vocab_size, (4, 6)).astype(np.int32)
local = slice(2 * pid, 2 * pid + 2)
batch = pm.shard_batch(
    {"enc_input": feats[local], "captions": caps_arr[local]}, mesh
)

step = jax.jit(train_step.make_xe_step(cfg, opt, end_to_end_model=False))
state, metrics = step(state, batch, jax.random.PRNGKey(7))
print(f"WORKER {pid} loss {float(metrics['loss']):.6f}", flush=True)

# rank-local row extraction from a global batch-sharded array (the SCST
# reward path): must return exactly this rank's loader shard, in order
loc = pm.local_rows(batch["captions"])
assert np.array_equal(loc, caps_arr[local]), (loc, caps_arr[local])

# checkpoint-safe host copy of the (multi-process sharded) train state:
# collective allgather, identical full values on every rank
params_h = pm.host_copy(state.params)
checksum = float(sum(np.abs(np.asarray(l)).sum() for l in jax.tree.leaves(params_h)))
print(f"WORKER {pid} hostcopy {checksum:.4f}", flush=True)

# ---- fused SCST step across the process boundary (recipe phases 4-6,
# reference train.py:124-172 under mp.spawn): sampling decode + device
# CIDEr-D + REINFORCE gradient psum in one jit, each rank feeding its
# loader shard of the reference tables.
from on_device_image_captioning_tpu.data.text import (  # noqa: E402
    EOS_TOKEN, PAD_TOKEN, SOS_TOKEN, UNK_TOKEN, Vocab,
)
from on_device_image_captioning_tpu.train.device_cider import (  # noqa: E402
    DeviceCiderCorpus,
)

words = [PAD_TOKEN, UNK_TOKEN, SOS_TOKEN, EOS_TOKEN] + [f"w{i}" for i in range(8)]
vocab = Vocab(word2idx={w: i for i, w in enumerate(words)})
refs = [["w0 w1 w2", "w1 w2"], ["w5 w6", "w6 w7"],
        ["w2 w4", "w0 w3"], ["w1 w7", "w3 w5"]]
dcorpus = DeviceCiderCorpus(refs, vocab)  # same corpus on every rank
scst_step = jax.jit(
    train_step.make_scst_fused_step(
        cfg, opt, end_to_end_model=False, num_samples=2, scst_max_len=8,
        sos_idx=cfg.sos_idx, eos_idx=cfg.eos_idx,
        reward_fn=dcorpus.make_reward_fn(),
    )
)
tables_global = dcorpus.batch(np.arange(4))
ref_tables = pm.shard_batch(
    {k: jnp.asarray(v[local]) for k, v in tables_global.items()}, mesh
)
state, sm = scst_step(state, {"enc_input": batch["enc_input"]}, ref_tables,
                      jax.random.PRNGKey(9))
print(
    f"WORKER {pid} scst loss {float(sm['loss']):.6f} "
    f"reward {float(sm['reward']):.6f}",
    flush=True,
)
jax.distributed.shutdown()
