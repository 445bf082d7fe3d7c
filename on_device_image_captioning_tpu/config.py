"""Configuration dataclasses for the TPU-native captioning framework.

One frozen config tree replaces the reference's hard-coded hyperparameter blocks that
were duplicated at every call site (reference: train.py:385-416, test.py:372-403,
demo.py:67-99, quantization.py:77-122).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DropConfig:
    """Dropout rates (reference: train.py drop_args Namespace, train.py:743-752)."""

    enc: float = 0.0
    dec: float = 0.0
    enc_input: float = 0.0
    dec_input: float = 0.0
    other: float = 0.0


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """Swin Transformer backbone config (reference: models/swin_transformer_mod.py:670-827).

    Defaults correspond to Swin-Large 384 as constructed at reference test.py:367-403.
    """

    img_size: int = 384
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    ape: bool = False
    patch_norm: bool = True
    ln_eps: float = 1e-5
    # 'xla' (batched dot_general, default) or 'pallas' (fused single-pass kernel,
    # ops/window_attention.py); numerically equivalent, pick by benchmark
    attention_impl: str = "xla"

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def patches_resolution(self) -> Tuple[int, int]:
        return (self.img_size // self.patch_size, self.img_size // self.patch_size)

    def stage_resolution(self, i: int) -> Tuple[int, int]:
        r = self.patches_resolution
        return (r[0] // (2**i), r[1] // (2**i))

    def stage_dim(self, i: int) -> int:
        return int(self.embed_dim * 2**i)


@dataclasses.dataclass(frozen=True)
class CaptionerConfig:
    """ExpansionNet v2 caption-head config (reference: models/End_ExpansionNet_v2.py:10-119).

    `num_exp_enc_list` are the Block Static Expansion group sizes (sum = number of
    expanded encoder slots); `num_exp_dec` is the per-token Dynamic Expansion factor.
    """

    d_model: int = 512
    N_enc: int = 3
    N_dec: int = 3
    ff: int = 2048
    num_heads: int = 8
    num_exp_enc_list: Tuple[int, ...] = (32, 64, 128, 256, 512)
    num_exp_dec: int = 16
    vocab_size: int = 10000
    max_seq_len: int = 74
    img_feature_dim: int = 1536
    sos_idx: int = 79
    eos_idx: int = 77
    pad_idx: int = 78
    unk_idx: int = 80
    drop: DropConfig = dataclasses.field(default_factory=DropConfig)
    eps: float = 1e-9  # expansion normalization eps (reference models/layers.py:106)
    ln_eps: float = 1e-5  # torch nn.LayerNorm default
    attn_fill: float = -1e4  # attention mask fill (reference models/layers.py:284)

    def __post_init__(self):
        # OOB special tokens would NaN-fill the token-embedding jnp.take in
        # the full-prefix decoder while the incremental decode clamps —
        # silently degenerate captions/losses (caught by a tiny-config audit:
        # vocab_size=50 with the COCO defaults 77-80 produced NaN logprobs).
        # Fail loudly at construction instead.
        for name in ("sos_idx", "eos_idx", "pad_idx", "unk_idx"):
            idx = getattr(self, name)
            if not 0 <= idx < self.vocab_size:
                raise ValueError(
                    f"CaptionerConfig.{name}={idx} is outside the vocab "
                    f"(vocab_size={self.vocab_size}); pass in-range special "
                    f"token indices (the 77-80 defaults fit COCO's 10k vocab "
                    f"only)"
                )

    @property
    def sum_exp_enc(self) -> int:
        return int(sum(self.num_exp_enc_list))

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full end-to-end model: Swin backbone + caption head.

    (reference: models/End_ExpansionNet_v2.py; swin final dim 1536 feeds
    input_linear → d_model 512.)
    """

    swin: SwinConfig = dataclasses.field(default_factory=SwinConfig)
    captioner: CaptionerConfig = dataclasses.field(default_factory=CaptionerConfig)
    # computation dtype for the heavy matmul path; params are stored float32 and
    # layer norms / softmaxes / L1 normalizations always run in float32.
    compute_dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        assert self.captioner.img_feature_dim == self.swin.num_features, (
            "captioner.img_feature_dim must equal swin.num_features "
            f"({self.captioner.img_feature_dim} != {self.swin.num_features})"
        )


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Decode-time arguments (reference: models/captioning_model.py:67-110
    `beam_search_args` dict)."""

    beam_size: int = 5
    how_many_outputs: int = 1
    max_seq_len: int = 74  # beam_max_seq_len / sample_max_seq_len
    sample_or_max: str = "max"
    sos_idx: int = 79
    eos_idx: int = 77
    # Decode-cache length schedule (chunked decode). Per-step decode cost
    # scales with the cache length L (every step reads/rewrites the full
    # (B, L, E, d) value caches), but real captions EOS after ~12-20 steps
    # while the eval CLI must allow the dataset max (74). The beam loop
    # therefore runs in phases: caches start at chunk_schedule[0] positions
    # and are zero-padded up to the next chunk only if some beam is still
    # growing. Positions beyond `pos` are masked either way, so results are
    # identical up to fp32 reduction order (contractions span the cache
    # length, so XLA groups the same nonzero terms differently — the same
    # deviation class as the Pallas step impl; token parity is tested).
    # None = automatic: single phase for short max_seq_len, (24, 48, ...,
    # max_seq_len) doubling schedule beyond; (max_seq_len,) disables
    # chunking. Non-final chunks must be even (see decode/beam_search.py).
    chunk_schedule: tuple | None = None


def swin_large_384() -> SwinConfig:
    """The Swin-L/384 backbone used by every reference entry point
    (reference: demo.py:67-99)."""
    return SwinConfig()


def expansionnet_v2_coco(drop: DropConfig = DropConfig()) -> CaptionerConfig:
    """Caption head as used for COCO (reference: demo.py:82-99, vocab 10k)."""
    return CaptionerConfig(drop=drop)


def end_expansionnet_v2_coco(
    drop: DropConfig = DropConfig(), compute_dtype=jnp.float32
) -> ModelConfig:
    return ModelConfig(
        swin=swin_large_384(),
        captioner=expansionnet_v2_coco(drop),
        compute_dtype=compute_dtype,
    )


def resolve_kernel_impls(attention_impl: str, dyn_step_impl: str):
    """Resolve the CLI-facing 'auto' kernel choices by backend: the fused
    Pallas Swin kernels + Pallas decode step on TPU (the configuration every
    perf number is measured at), the reference-exact XLA op order elsewhere
    (CPU tests, parity work). Explicit choices pass through unchanged."""
    if attention_impl == "auto" or dyn_step_impl == "auto":
        import jax

        on_tpu = jax.default_backend() == "tpu"
        if attention_impl == "auto":
            attention_impl = "fused" if on_tpu else "xla"
        if dyn_step_impl == "auto":
            dyn_step_impl = "pallas" if on_tpu else "xla"
    return attention_impl, dyn_step_impl


def remove_layers(cfg: ModelConfig, param_config: int) -> ModelConfig:
    """Layer-removal ablations (reference: train.py:374-379).

    param_config: 0 = baseline, 1 = remove one encoder layer, 2 = remove one encoder
    and one decoder layer.
    """
    if param_config == 0:
        return cfg
    cap = cfg.captioner
    if param_config == 1:
        cap = dataclasses.replace(cap, N_enc=cap.N_enc - 1)
    elif param_config == 2:
        cap = dataclasses.replace(cap, N_enc=cap.N_enc - 1, N_dec=cap.N_dec - 1)
    else:
        raise ValueError(f"param_config must be 0/1/2, got {param_config}")
    return dataclasses.replace(cfg, captioner=cap)
