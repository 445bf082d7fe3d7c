"""SCST-phase throughput on the real TPU (VERDICT r2 item 4): the full
self-critical step the recipe's phases 4-6 run (reference train.py:124-172) —

  sample   device: Swin-L/384 forward_enc + 5 multinomial samples/image (L=20)
  reward   host:   token->string + CIDEr vs the image's refs (precomputed DF;
                   native C++ scorer when built)
  grad     device: teacher-forced re-score fwd + REINFORCE bwd + RAdam

Measured three ways: each phase alone, the sequential loop the train CLI runs
today, and a software-pipelined loop (sample batch t+1 enqueued BEFORE the
host reward of batch t, so the chip works through the host-side scoring —
the tunnel ships sampled tokens eagerly either way).

    python scripts/bench_scst.py [batch] [iters] [num_samples]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    num_samples = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    scst_max_len = 20

    import dataclasses

    from on_device_image_captioning_tpu.config import end_expansionnet_v2_coco
    from on_device_image_captioning_tpu.data.text import (
        EOS_TOKEN, PAD_TOKEN, SOS_TOKEN, UNK_TOKEN, Vocab,
    )
    from on_device_image_captioning_tpu.decode import sampling
    from on_device_image_captioning_tpu.decode.cache import set_dyn_step_impl
    from on_device_image_captioning_tpu.models import end_to_end
    from on_device_image_captioning_tpu.train.radam import radam
    from on_device_image_captioning_tpu.train.scst import CiderReward
    from on_device_image_captioning_tpu.train.train_step import (
        init_train_state, make_scst_step,
    )

    set_dyn_step_impl("pallas")
    cfg = end_expansionnet_v2_coco(compute_dtype=jnp.bfloat16)
    cfg = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, attention_impl="fused")
    )
    cap_cfg = cfg.captioner

    # synthetic 10k vocab + training-reference corpus at COCO scale-ish
    words = [PAD_TOKEN, SOS_TOKEN, EOS_TOKEN, UNK_TOKEN] + [
        f"w{i}" for i in range(cap_cfg.vocab_size - 4)
    ]
    vocab = Vocab({w: i for i, w in enumerate(words)})
    rng = np.random.default_rng(0)
    n_train = 5000
    refs = [
        [
            " ".join(rng.choice(words[4:1000], size=rng.integers(8, 14)))
            for _ in range(5)
        ]
        for _ in range(n_train)
    ]
    t0 = time.perf_counter()
    reward_fn = CiderReward(refs)
    print(f"CiderReward corpus build ({n_train} imgs x 5 refs): "
          f"{time.perf_counter() - t0:.2f} s "
          f"(native={'cider_native' in type(reward_fn.corpus).__module__})",
          flush=True)

    params = end_to_end.init(jax.random.PRNGKey(0), cfg)
    opt = radam(1e-5)
    state = init_train_state(params, opt)
    scst_step = jax.jit(
        make_scst_step(cfg, opt, end_to_end_model=True, num_samples=num_samples)
    )

    @jax.jit
    def sample_batch(params, enc_input, rng_key):
        enc = end_to_end.forward_enc(params, cfg, enc_input)
        return sampling.sample(
            params["captioner"], cap_cfg, enc, num_samples, scst_max_len,
            rng_key, vocab.sos_idx, vocab.eos_idx,
        )

    images = jnp.asarray(
        rng.standard_normal((batch, 384, 384, 3), dtype=np.float32)
    )
    img_idxs = rng.integers(0, n_train, batch)
    key = jax.random.PRNGKey(1)

    def host_reward(sampled):
        toks = np.asarray(sampled.tokens)
        lens = np.asarray(sampled.lengths)
        return reward_fn(toks, lens, img_idxs, vocab)

    def full_iter(state, key):
        key, sub = jax.random.split(key)
        sampled = sample_batch(state.params, images, sub)
        rewards = host_reward(sampled)
        key, sub2 = jax.random.split(key)
        state, metrics = scst_step(
            state, {"enc_input": images},
            {"tokens": sampled.tokens, "lengths": sampled.lengths},
            jnp.asarray(rewards), sub2,
        )
        return state, metrics, key

    # compile + warm
    state, metrics, key = full_iter(state, key)
    jax.device_get(metrics["loss"])

    # phase timings
    t0 = time.perf_counter()
    for _ in range(iters):
        sampled = sample_batch(state.params, images, key)
    jax.device_get(sampled.tokens)
    t_sample = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        rewards = host_reward(sampled)
    t_reward = (time.perf_counter() - t0) / iters

    sd = {"tokens": sampled.tokens, "lengths": sampled.lengths}
    rw = jnp.asarray(rewards)
    st = state
    t0 = time.perf_counter()
    for _ in range(iters):
        st, metrics = scst_step(st, {"enc_input": images}, sd, rw,
                                jax.random.PRNGKey(3))
    jax.device_get(metrics["loss"])
    t_grad = (time.perf_counter() - t0) / iters

    # the sequential loop the train CLI runs
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics, key = full_iter(state, key)
    jax.device_get(metrics["loss"])
    t_seq = (time.perf_counter() - t0) / iters

    # software-pipelined: enqueue batch t+1's sampling before batch t's host
    # reward, so the chip samples while the host scores. NOTE this samples
    # with params that are STALE BY ONE STEP (off-policy-by-one REINFORCE) —
    # a semantic change vs the reference recipe; measured here to quantify
    # the ceiling, only worth adopting if the sequential gap is large.
    key, sub = jax.random.split(key)
    pending = sample_batch(state.params, images, sub)
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        nxt = sample_batch(state.params, images, sub)  # enqueue ahead
        rewards = host_reward(pending)
        key, sub2 = jax.random.split(key)
        state, metrics = scst_step(
            state, {"enc_input": images},
            {"tokens": pending.tokens, "lengths": pending.lengths},
            jnp.asarray(rewards), sub2,
        )
        pending = nxt
    jax.device_get(metrics["loss"])
    t_pipe = (time.perf_counter() - t0) / iters

    # fully fused: sample + DEVICE CIDEr + grad in ONE jit (no host sync;
    # the only host work per iteration is the numpy table gather)
    from on_device_image_captioning_tpu.train.device_cider import (
        DeviceCiderCorpus,
    )
    from on_device_image_captioning_tpu.train.train_step import make_scst_step

    dcorpus = DeviceCiderCorpus(refs, vocab)
    device_reward = dcorpus.make_reward_fn()
    scst_inner = make_scst_step(
        cfg, opt, end_to_end_model=True, num_samples=num_samples
    )

    @jax.jit
    def fused(state, images, ref_tables, rng_key):
        rng_s, rng_g = jax.random.split(rng_key)
        enc = end_to_end.forward_enc(state.params, cfg, images)
        sampled = sampling.sample(
            state.params["captioner"], cap_cfg, enc, num_samples,
            scst_max_len, rng_s, vocab.sos_idx, vocab.eos_idx,
        )
        rewards = device_reward(sampled.tokens, sampled.lengths, ref_tables)
        return scst_inner(
            state, {"enc_input": images},
            {"tokens": sampled.tokens, "lengths": sampled.lengths},
            rewards, rng_g,
        )

    bt = {k: jnp.asarray(v) for k, v in dcorpus.batch(img_idxs).items()}
    state, metrics = fused(state, images, bt, key)  # compile+warm
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        bt = {k: jnp.asarray(v) for k, v in dcorpus.batch(img_idxs).items()}
        state, metrics = fused(state, images, bt, sub)
    jax.device_get(metrics["loss"])
    t_fused = (time.perf_counter() - t0) / iters

    # shared-forward fused: the encoder (Swin + expansion enc) runs ONCE per
    # iteration under jax.vjp — sampling consumes its output and the
    # REINFORCE backward pulls the encoder cotangent through the saved vjp
    # instead of re-running the train-mode forward (train_step.
    # make_scst_fused_step)
    from on_device_image_captioning_tpu.train.train_step import (
        make_scst_fused_step,
    )

    shared = jax.jit(
        make_scst_fused_step(
            cfg, opt, end_to_end_model=True, num_samples=num_samples,
            scst_max_len=scst_max_len, sos_idx=vocab.sos_idx,
            eos_idx=vocab.eos_idx, reward_fn=device_reward,
        )
    )
    bt = {k: jnp.asarray(v) for k, v in dcorpus.batch(img_idxs).items()}
    state, metrics = shared(state, {"enc_input": images}, bt, key)
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        bt = {k: jnp.asarray(v) for k, v in dcorpus.batch(img_idxs).items()}
        state, metrics = shared(state, {"enc_input": images}, bt, sub)
    jax.device_get(metrics["loss"])
    t_shared = (time.perf_counter() - t0) / iters

    print(f"SCST b{batch} x{num_samples} samples, L{scst_max_len}, Swin-L/384 "
          f"bf16 fused+pallas:")
    print(f"  sample (device)      {t_sample * 1000:8.1f} ms")
    print(f"  reward (host CIDEr)  {t_reward * 1000:8.1f} ms")
    print(f"  grad step (device)   {t_grad * 1000:8.1f} ms")
    print(f"  sequential loop      {t_seq * 1000:8.1f} ms -> "
          f"{batch / t_seq:6.2f} img/s")
    print(f"  pipelined loop       {t_pipe * 1000:8.1f} ms -> "
          f"{batch / t_pipe:6.2f} img/s   (stale-by-one sampling)")
    print(f"  fused device-reward  {t_fused * 1000:8.1f} ms -> "
          f"{batch / t_fused:6.2f} img/s   (one jit, device CIDEr)")
    print(f"  fused shared-fwd     {t_shared * 1000:8.1f} ms -> "
          f"{batch / t_shared:6.2f} img/s   (one jit, one encoder fwd via vjp)")


if __name__ == "__main__":
    main()
