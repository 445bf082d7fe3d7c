"""Jittable training steps: cross-entropy (XE) teacher-forcing and SCST gradient.

Reference training loop semantics (reference train.py:47-302):
- XE: model(enc_x, dec_x = y[:, :-1]) vs target y[:, 1:] under the label-smoothing
  loss (train.py:110-123);
- gradient accumulation = optimizer.step() every num_accum iterations
  (train.py:174-176) -> wrap the optimizer in optax.MultiSteps;
- SCST: sample N captions per image, CIDEr reward with leave-one-out mean baseline,
  loss = (r - b) * sum(-logp) (train.py:124-172, losses/reward.py) — here the
  gradient pass re-scores the sampled captions teacher-forced (identical logprobs
  to the sampling pass, but differentiable without backprop through the decode
  loop).

Data parallelism: callers jit these steps with the batch sharded on the mesh's
'data' axis and params replicated (or TP-sharded per parallel/mesh.py) — XLA
inserts the gradient psum that DDP's all-reduce performed in the reference.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import CaptionerConfig, ModelConfig
from ..models import captioner as cap
from ..models import end_to_end
from .losses import label_smoothing_loss, mean_baseline, scst_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params, opt_state=optimizer.init(params), step=jnp.zeros([], jnp.int32)
    )


def make_xe_step(
    cfg,
    optimizer: optax.GradientTransformation,
    end_to_end_model: bool,
    smoothing: float = 0.1,
    remat: bool = False,
) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: {'enc_input': images NHWC or features (B,S,F), 'captions': (B,T) int32
    right-padded with PAD} — dec input/target split happens here
    (reference train.py:107-121).
    """
    if end_to_end_model:
        model_cfg: ModelConfig = cfg
        cap_cfg = model_cfg.captioner
    else:
        cap_cfg: CaptionerConfig = cfg

    def loss_fn(params, batch, rng):
        captions = batch["captions"]
        dec_input = captions[:, :-1]
        targets = captions[:, 1:]
        dec_pads = jnp.sum(dec_input == cap_cfg.pad_idx, axis=-1)
        if end_to_end_model:
            logits = end_to_end.forward(
                params, model_cfg, batch["enc_input"], dec_input,
                dec_num_pads=dec_pads, rng=rng, train=True, remat=remat,
            )
        else:
            logits = cap.forward(
                params, cap_cfg, batch["enc_input"], dec_input,
                enc_num_pads=batch.get("enc_num_pads"), dec_num_pads=dec_pads,
                rng=rng, train=True,
            )
        loss = label_smoothing_loss(logits, targets, cap_cfg.pad_idx, smoothing)
        return loss

    def step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss},
        )

    return step


def make_scst_step(
    cfg,
    optimizer: optax.GradientTransformation,
    end_to_end_model: bool,
    num_samples: int,
    remat: bool = False,
) -> Callable:
    """Returns step(state, batch, sampled, rewards, rng) -> (state, metrics).

    `sampled`: {'tokens': (B, N, L+1) from decode.sampling (SOS + caption),
    'lengths': (B, N) index of first EOS}; `rewards`: (B, N) CIDEr scores computed
    on host between the sampling call and this step. The teacher-forced re-score
    runs the same decoder over the sampled captions, giving the REINFORCE
    gradient without differentiating the decode loop. The forward runs in
    TRAIN mode so the backbone routes through the fused-train custom-VJP
    kernels (the inference kernels are not differentiable), but by default
    `rng=None` keeps dropout/drop-path OFF: the re-scored logprobs then
    reproduce the sampling logprobs exactly, so the estimator is the
    textbook unbiased REINFORCE gradient for the (eval-mode) policy the
    captions were actually sampled from. Passing an rng (cli/train.py
    --scst_dropout) instead applies an INDEPENDENT dropout draw to the
    re-score — closer in spirit to the reference, whose sampling forward
    runs with dropout active and is backpropped directly
    (train.py:124-172) — but since our samples come from the no-dropout
    policy while the gradient is of a dropout-noised logprob, that
    estimator carries a policy mismatch the reference's does not; it is
    exact only at dropout 0. (Reproducing the reference's estimator
    exactly would require sampling under the same dropout masks as the
    re-score, which the incremental decode kernels do not support.)
    """
    if end_to_end_model:
        model_cfg: ModelConfig = cfg
        cap_cfg = model_cfg.captioner
    else:
        cap_cfg: CaptionerConfig = cfg

    def loss_fn(params, batch, sampled, rewards, rng):
        tokens = sampled["tokens"]  # (B, N, L+1)
        lengths = sampled["lengths"]  # (B, N)
        b, n, lp1 = tokens.shape
        flat = tokens.reshape(b * n, lp1)
        rng_enc, rng_dec = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        if end_to_end_model:
            enc = end_to_end.forward_enc(
                params, model_cfg, batch["enc_input"], rng=rng_enc,
                train=True, remat=remat,
            )
        else:
            enc = cap.forward_enc(
                params, cap_cfg, batch["enc_input"],
                enc_num_pads=batch.get("enc_num_pads"), rng=rng_enc,
                train=True,
            )
        enc_rep = jnp.repeat(enc, n, axis=0)
        enc_pads = batch.get("enc_num_pads")
        logits = cap.forward_dec(
            params["captioner"] if end_to_end_model else params,
            cap_cfg, enc_rep, flat[:, :-1], apply_log_softmax=True,
            enc_num_pads=None if enc_pads is None else jnp.repeat(enc_pads, n, axis=0),
            rng=rng_dec, train=True,
            dtype=(model_cfg.compute_dtype if end_to_end_model else None),
        )  # (B*N, L, V)
        step_lp = jnp.take_along_axis(logits, flat[:, 1:, None], axis=-1)[..., 0]
        # zero logprobs beyond the first EOS (position t+1 corresponds to token
        # index t+1; keep up to and including EOS — reference :206-215)
        pos = jax.lax.broadcasted_iota(jnp.int32, step_lp.shape, 1)
        keep = pos < lengths.reshape(b * n, 1)
        step_lp = jnp.where(keep, step_lp, 0.0).reshape(b, n, -1)
        baselines = mean_baseline(rewards)
        loss = scst_loss(step_lp, rewards, baselines)
        return loss, (rewards.mean(), baselines.mean(), step_lp.sum(-1).mean())

    def step(state: TrainState, batch, sampled, rewards, rng=None):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sampled, rewards, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        reward_mean, base_mean, logp_mean = aux
        return (
            TrainState(params, opt_state, state.step + 1),
            {
                "loss": loss,
                "reward": reward_mean,
                "baseline": base_mean,
                "logprob_sum": logp_mean,
            },
        )

    return step


def make_scst_fused_step(
    cfg,
    optimizer: optax.GradientTransformation,
    end_to_end_model: bool,
    num_samples: int,
    scst_max_len: int,
    sos_idx: int,
    eos_idx: int,
    reward_fn: Callable,
    remat: bool = False,
    dropout: bool = False,
) -> Callable:
    """ONE-jit SCST step with a SHARED encoder forward: sample + reward +
    REINFORCE grad + optimizer, where the encoder (Swin backbone + expansion
    encoder) runs its train-mode forward exactly ONCE per iteration.

    make_scst_step re-runs the full encoder inside the grad pass after the
    sampling call already ran it in inference mode — at Swin-L/384 b16 that
    second backbone forward is ~40 ms of the 256 ms step (measured,
    scripts/bench_scst.py). Here the encoder runs once under jax.vjp; the
    sampler consumes its (stop-gradient) output, the decoder-only re-score
    is differentiated wrt (captioner params, enc), and the encoder cotangent
    is pulled back through the saved vjp. This is also the *more* consistent
    estimator: sampling and re-score see the SAME encoder activations
    (make_scst_step's two passes differ by train-vs-inference kernel
    rounding at bf16).

    reward_fn(tokens, lengths, ref_tables) -> (B, N) rewards must be
    traceable (e.g. train.device_cider.cider_reward closed over the corpus
    DF tables); ref_tables is passed through from the step call.

    dropout=False (default) keeps dropout off: sampling and re-score share
    one deterministic policy — the textbook unbiased REINFORCE gradient.
    With dropout=True (cli --scst_dropout), the ENCODER dropout draw is
    shared between sampling and gradient (the sampled-from policy IS the
    differentiated one — closer to the reference, whose noisy sampling
    forward is backpropped directly, train.py:124-172); only the decoder
    re-score takes an independent draw, as the incremental sampler's
    kernels cannot replay the decoder's dropout masks.

    Returns step(state, batch, ref_tables, rng) -> (state, metrics); rng
    always seeds the multinomial sampler (and the dropout draws when
    dropout=True). batch: {'enc_input': images NHWC or features,
    'enc_num_pads'?: (B,)}.
    """
    if end_to_end_model:
        model_cfg: ModelConfig = cfg
        cap_cfg = model_cfg.captioner
    else:
        cap_cfg: CaptionerConfig = cfg

    from ..decode import sampling

    def step(state: TrainState, batch, ref_tables, rng):
        if dropout:
            rng_enc, rng_dec, rng_s = jax.random.split(rng, 3)
        else:
            rng_enc, rng_dec, rng_s = None, None, rng
        enc_pads = batch.get("enc_num_pads")

        def enc_fn(params):
            if end_to_end_model:
                return end_to_end.forward_enc(
                    params, model_cfg, batch["enc_input"], rng=rng_enc,
                    train=True, remat=remat,
                )
            return cap.forward_enc(
                params, cap_cfg, batch["enc_input"], enc_num_pads=enc_pads,
                rng=rng_enc, train=True,
            )

        enc, enc_vjp = jax.vjp(enc_fn, state.params)
        sampled = sampling.sample(
            state.params["captioner"] if end_to_end_model else state.params,
            cap_cfg, jax.lax.stop_gradient(enc), num_samples, scst_max_len,
            rng_s, sos_idx, eos_idx, enc_num_pads=enc_pads,
        )
        rewards = reward_fn(sampled.tokens, sampled.lengths, ref_tables)

        tokens = sampled.tokens  # (B, N, L+1)
        lengths = sampled.lengths  # (B, N)
        b, n, lp1 = tokens.shape
        flat = tokens.reshape(b * n, lp1)

        def dec_loss(dec_params, enc_in):
            enc_rep = jnp.repeat(enc_in, n, axis=0)
            logits = cap.forward_dec(
                dec_params, cap_cfg, enc_rep, flat[:, :-1],
                apply_log_softmax=True,
                enc_num_pads=None if enc_pads is None
                else jnp.repeat(enc_pads, n, axis=0),
                rng=rng_dec, train=True,
                dtype=(model_cfg.compute_dtype if end_to_end_model else None),
            )  # (B*N, L, V)
            step_lp = jnp.take_along_axis(
                logits, flat[:, 1:, None], axis=-1
            )[..., 0]
            pos = jax.lax.broadcasted_iota(jnp.int32, step_lp.shape, 1)
            keep = pos < lengths.reshape(b * n, 1)
            step_lp = jnp.where(keep, step_lp, 0.0).reshape(b, n, -1)
            baselines = mean_baseline(rewards)
            loss = scst_loss(step_lp, rewards, baselines)
            return loss, (rewards.mean(), baselines.mean(),
                          step_lp.sum(-1).mean())

        dec_params = (
            state.params["captioner"] if end_to_end_model else state.params
        )
        (loss, aux), (g_dec, g_enc) = jax.value_and_grad(
            dec_loss, argnums=(0, 1), has_aux=True
        )(dec_params, enc)
        (grads,) = enc_vjp(g_enc)
        # decoder grads live in the captioner subtree; encoder-path grads
        # (swin + expansion encoder) came through the vjp — sum leaf-wise
        if end_to_end_model:
            grads = {
                **grads,
                "captioner": jax.tree.map(
                    jnp.add, grads["captioner"], g_dec
                ),
            }
        else:
            grads = jax.tree.map(jnp.add, grads, g_dec)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        reward_mean, base_mean, logp_mean = aux
        return (
            TrainState(params, opt_state, state.step + 1),
            {
                "loss": loss,
                "reward": reward_mean,
                "baseline": base_mean,
                "logprob_sum": logp_mean,
            },
        )

    return step


def with_grad_accum(
    optimizer: optax.GradientTransformation, num_accum: int
) -> optax.GradientTransformation:
    """Apply the optimizer every num_accum micro-steps (reference train.py:174-176)."""
    if num_accum <= 1:
        return optimizer
    return optax.MultiSteps(optimizer, every_k_schedule=num_accum)
