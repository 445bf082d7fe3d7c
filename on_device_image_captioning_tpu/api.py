"""High-level captioning API: the mode-dispatch interface the reference exposes.

Rebuilds both reference API generations in one place (SURVEY §0 notes the
refactor was mid-flight and entry points rely on legacy dispatch semantics):
- legacy `model(enc_x, mode='forward'|'beam_search'|'sampling')` dispatch
  (reference legacy_models/captioning_model.py:24-57);
- the new split-encoder `Captioner` driver (reference models/captioning_model.py:40-110,
  models/End_ExpansionNet_v2.py:311-452) — here "split" is inherent: forward_enc /
  forward_dec are already separate pure functions over one params pytree, so the
  encoder/decoder halves can be quantized, AOT-compiled, or deployed separately
  without duplicate module classes.

Decode calls are jit-compiled once per (batch, beam, max_len) shape and cached.
"""
from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import CaptionerConfig, DecodeConfig, ModelConfig
from .decode import beam_search as bs
from .decode import sampling as smp
from .models import captioner as cap_mod
from .models import end_to_end


class Captioner:
    """One model (end-to-end or features-in), mode-dispatch inference.

    beam_search_args mirrors the reference dict: sos_idx, eos_idx, beam_size,
    how_many_outputs, beam_max_seq_len / sample_max_seq_len, sample_or_max
    (reference models/captioning_model.py:67-110).
    """

    def __init__(
        self,
        params: Any,
        cfg: Union[ModelConfig, CaptionerConfig],
        beam_search_args: Optional[dict] = None,
    ):
        self.end_to_end = isinstance(cfg, ModelConfig)
        if self.end_to_end and "swin" in params and "stages" in params["swin"]:
            # inference wrapper: pre-expand the Swin rel-pos biases once
            params = end_to_end.prepare_inference_params(params, cfg)
        self.params = params
        self.cfg = cfg
        self.cap_cfg = cfg.captioner if self.end_to_end else cfg
        self.beam_search_args = dict(beam_search_args or {})
        self.beam_search_args.setdefault("sos_idx", self.cap_cfg.sos_idx)
        self.beam_search_args.setdefault("eos_idx", self.cap_cfg.eos_idx)

    # -- halves (the split-encoder surface) ---------------------------------

    def forward_enc(self, enc_input, enc_num_pads=None):
        if self.end_to_end:
            return self._jit_enc_e2e(self.params, jnp.asarray(enc_input))
        pads = None if enc_num_pads is None else jnp.asarray(enc_num_pads)
        return self._jit_enc_feat(self.params, jnp.asarray(enc_input), pads)

    def forward_dec(self, cross_input, dec_input, dec_num_pads=None,
                    apply_log_softmax=False):
        pads = None if dec_num_pads is None else jnp.asarray(dec_num_pads)
        if self.end_to_end:
            return end_to_end.forward_dec(
                self.params, self.cfg, cross_input, jnp.asarray(dec_input), pads,
                apply_log_softmax=apply_log_softmax,
            )
        return cap_mod.forward_dec(
            self.params, self.cfg, cross_input, jnp.asarray(dec_input), pads,
            apply_log_softmax=apply_log_softmax,
        )

    @functools.cached_property
    def _jit_enc_e2e(self):
        cfg = self.cfg
        return jax.jit(lambda p, x: end_to_end.forward_enc(p, cfg, x))

    @functools.cached_property
    def _jit_enc_feat(self):
        cfg = self.cfg
        return jax.jit(lambda p, x, pads: cap_mod.forward_enc(p, cfg, x, pads))

    # -- dispatch (legacy API) ----------------------------------------------

    def __call__(
        self,
        enc_x,
        dec_x=None,
        enc_x_num_pads=None,
        dec_x_num_pads=None,
        mode: str = "beam_search",
        rng: Optional[jax.Array] = None,
    ):
        if mode == "forward":
            cross = self.forward_enc(enc_x, enc_x_num_pads)
            return self.forward_dec(cross, dec_x, dec_x_num_pads,
                                    apply_log_softmax=True)
        if mode == "beam_search":
            return self.beam_search(enc_x, enc_x_num_pads, rng=rng)
        if mode == "sampling":
            return self.sample(enc_x, enc_x_num_pads, rng=rng)
        raise ValueError(f"unknown mode {mode!r}")

    def beam_search(self, enc_x, enc_x_num_pads=None, rng=None
                    ) -> Tuple[List[List[List[int]]], List]:
        a = self.beam_search_args
        dcfg = DecodeConfig(
            beam_size=a.get("beam_size", 5),
            how_many_outputs=a.get("how_many_outputs", 1),
            max_seq_len=a.get("beam_max_seq_len", 20),
            sample_or_max=a.get("sample_or_max", "max"),
            sos_idx=a["sos_idx"], eos_idx=a["eos_idx"],
        )
        cross = self.forward_enc(enc_x, enc_x_num_pads)
        pads = None if enc_x_num_pads is None else jnp.asarray(enc_x_num_pads)
        res = self._beam_fn(dcfg)(self._dec_params, cross,
                                  rng if rng is not None else jax.random.PRNGKey(0),
                                  pads)
        return bs.captions_from_result(res)

    def sample(self, enc_x, enc_x_num_pads=None, rng=None):
        a = self.beam_search_args
        n = a.get("how_many_outputs", 1)
        max_len = a.get("sample_max_seq_len", 20)
        cross = self.forward_enc(enc_x, enc_x_num_pads)
        pads = None if enc_x_num_pads is None else jnp.asarray(enc_x_num_pads)
        res = self._sample_fn(n, max_len)(
            self._dec_params, cross,
            rng if rng is not None else jax.random.PRNGKey(0),
            pads,
        )
        caps = smp.captions_from_result(res)
        return caps, res.logprobs

    @property
    def _dec_params(self):
        return self.params["captioner"] if self.end_to_end else self.params

    @functools.lru_cache(maxsize=8)
    def _beam_fn(self, dcfg: DecodeConfig):
        cap_cfg = self.cap_cfg
        dtype = self.cfg.compute_dtype if self.end_to_end else None
        return jax.jit(
            lambda p, c, r, pads: bs.beam_search(
                p, cap_cfg, c, dcfg, rng=r, dtype=dtype, enc_num_pads=pads
            )
        )

    @functools.lru_cache(maxsize=8)
    def _sample_fn(self, n: int, max_len: int):
        cap_cfg = self.cap_cfg
        dtype = self.cfg.compute_dtype if self.end_to_end else None
        a = self.beam_search_args
        return jax.jit(
            lambda p, c, r, pads: smp.sample(
                p, cap_cfg, c, n, max_len, r, a["sos_idx"], a["eos_idx"],
                dtype=dtype, enc_num_pads=pads,
            )
        )


class EnsembleCaptioner:
    """Multi-checkpoint beam decoding (reference
    models/ensemble_captioning_model.py:6-291): each model encodes with its own
    weights; per-step probabilities are averaged in probability space."""

    def __init__(self, captioners: Sequence[Captioner], beam_search_args=None):
        assert captioners, "need at least one model"
        self.captioners = list(captioners)
        self.cap_cfg = captioners[0].cap_cfg
        self.beam_search_args = dict(
            beam_search_args or captioners[0].beam_search_args
        )

    def __call__(self, enc_x, enc_x_num_pads=None, mode="beam_search", rng=None):
        assert mode == "beam_search", "ensemble supports only beam search"
        a = self.beam_search_args
        dcfg = DecodeConfig(
            beam_size=a.get("beam_size", 5),
            how_many_outputs=a.get("how_many_outputs", 1),
            max_seq_len=a.get("beam_max_seq_len", 20),
            sample_or_max=a.get("sample_or_max", "max"),
            sos_idx=a["sos_idx"], eos_idx=a["eos_idx"],
        )
        encs = [c.forward_enc(enc_x, enc_x_num_pads) for c in self.captioners]
        params_list = [c._dec_params for c in self.captioners]
        res = bs.ensemble_beam_search(
            params_list, self.cap_cfg, encs, dcfg,
            rng=rng if rng is not None else jax.random.PRNGKey(0),
            enc_num_pads=(
                None if enc_x_num_pads is None else jnp.asarray(enc_x_num_pads)
            ),
        )
        return bs.captions_from_result(res)
