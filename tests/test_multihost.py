"""Real multi-process SPMD: two OS processes rendezvous via
jax.distributed.initialize, each contributes its rank shard of the batch, and
the XE step's gradient psum crosses the process boundary — the capability the
reference gets from mp.spawn + NCCL DDP (reference train.py:616-643), here
exercised for real rather than simulated on one process."""
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_xe_step(tmp_path):
    import pathlib

    worker = pathlib.Path(__file__).resolve().parent / "_multihost_worker.py"
    port = _free_port()
    env_base = {"PYTHONUNBUFFERED": "1"}
    import os

    env = {**os.environ, **env_base}
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    losses = {}
    checksums = {}
    scst = {}
    for out in outs:
        m = re.search(r"WORKER (\d) loss ([\d.]+)", out)
        assert m, out[-3000:]
        losses[int(m.group(1))] = float(m.group(2))
        m = re.search(r"WORKER (\d) hostcopy ([\d.]+)", out)
        assert m, out[-3000:]
        checksums[int(m.group(1))] = float(m.group(2))
        m = re.search(r"WORKER (\d) scst loss ([-\d.]+) reward ([\d.]+)", out)
        assert m, out[-3000:]
        scst[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(losses) == {0, 1}
    # both processes computed the same global step and the same host copy of
    # the post-step params (the checkpoint-save path)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(checksums[0], checksums[1], rtol=1e-6)
    # the fused SCST step (sampling + device CIDEr + gradient psum in one
    # jit) also agrees across the process boundary
    np.testing.assert_allclose(scst[0], scst[1], rtol=1e-5, atol=1e-7)

    # ground truth: the same global batch on this process's 4 local devices
    import jax
    import jax.numpy as jnp
    import optax

    from on_device_image_captioning_tpu.config import CaptionerConfig
    from on_device_image_captioning_tpu.models import captioner as cap
    from on_device_image_captioning_tpu.parallel import mesh as pm
    from on_device_image_captioning_tpu.train import train_step

    cfg = CaptionerConfig(
        d_model=32, N_enc=1, N_dec=1, ff=64, num_heads=4, num_exp_enc_list=(4,),
        num_exp_dec=4, vocab_size=32, max_seq_len=12, img_feature_dim=8,
        sos_idx=2, eos_idx=3, pad_idx=0, unk_idx=1,
    )
    params = cap.captioner_init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    state = train_step.init_train_state(params, opt)
    mesh = pm.make_default_mesh(4)
    state = pm.shard_train_state(state, mesh)
    rng = np.random.default_rng(0)
    batch = pm.shard_batch(
        {
            "enc_input": rng.standard_normal((4, 5, cfg.img_feature_dim),
                                             dtype=np.float32),
            "captions": rng.integers(1, cfg.vocab_size, (4, 6)).astype(np.int32),
        },
        mesh,
    )
    step = jax.jit(train_step.make_xe_step(cfg, opt, end_to_end_model=False))
    _, metrics = step(state, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(losses[0], float(metrics["loss"]), rtol=2e-5)
