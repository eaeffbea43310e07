"""LKVA — Linear Key-Value Association memory module.

"LKVA defines frame-to-frame causal relations as the state transition matrix"
and "effectively model[s] inter-frame correlations" (reference:
website/src/content/homepage/en.json:20, README.md:20): inter-frame memory
read/write is linear attention over a fixed-size associative state
``S ∈ R^{d_k × d_v}`` per head — O(1) state per frame, no growing KV bank.

This module owns the projections and gates around the GDR recurrence core
(gdkvm_tpu/core/gdr.py):

- q, k: dense projections → SiLU → per-head L2 normalization (keeps the
  delta rule contractive and readout magnitudes bounded).
- v: dense projection of pixel features; mask-prompt writes add an additive
  mask embedding (``prompt_write``), so the same value space serves both.
- β (write strength, per token per head) and α (forget gate, per frame per
  head, from pooled frame context) — both sigmoid-gated, α biased toward 1
  at init (remember long).
- Readout: per-head RMSNorm → data-dependent SiLU gate → output projection,
  reshaped back to a stride-16 feature map (the "global key feature" that
  KPFF fuses, reference: homepage/en.json:20).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gdkvm_tpu.core import gdr


def gdr_pallas_mod():
    from gdkvm_tpu.ops import gdr_pallas
    return gdr_pallas


def _l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


class LKVAMemory(nn.Module):
    """Multi-head linear key-value association over the GDR state."""
    num_heads: int = 4
    head_dim_k: int = 64
    head_dim_v: int = 64
    out_channels: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    gdr_impl: str = "auto"       # auto | chunked | assoc | ref | pallas
    gdr_variant: str = "gdn"           # gdn (η=β) | gdn2 (separate erase)

    def _impl(self) -> str:
        """Resolve 'auto' at trace time: the transpose-free Pallas kernel
        won or tied the XLA chunked form at EVERY measured shape on v5e
        (fwd 0.99-1.97×, see BASELINE.md GDR crossover table), so auto =
        pallas on any real accelerator and chunked on CPU (where the
        kernel would run in slow interpret mode)."""
        if self.gdr_impl == "auto":
            import jax as _jax
            return "pallas" if _jax.default_backend() != "cpu" \
                else "chunked"
        return self.gdr_impl

    def setup(self):
        h, dk, dv = self.num_heads, self.head_dim_k, self.head_dim_v
        self.q_proj = nn.Dense(h * dk, use_bias=False, dtype=self.dtype)
        self.k_proj = nn.Dense(h * dk, use_bias=False, dtype=self.dtype)
        self.v_proj = nn.Dense(h * dv, use_bias=False, dtype=self.dtype)
        # Mask-prompt embedding adds into value space (prompt_write only).
        self.mask_proj = nn.Dense(h * dv, use_bias=False, dtype=self.dtype)
        self.beta_proj = nn.Dense(
            h, dtype=self.dtype,
            bias_init=nn.initializers.constant(-1.0))
        if self.gdr_variant == "gdn2":
            # Decoupled erase gate η (GDN-2 lineage): initialized to match
            # β's bias so training starts at the coupled rule's behavior.
            self.eta_proj = nn.Dense(
                h, dtype=self.dtype,
                bias_init=nn.initializers.constant(-1.0))
        elif self.gdr_variant != "gdn":
            raise ValueError(f"gdr_variant must be gdn|gdn2, "
                             f"got {self.gdr_variant!r}")
        # α from pooled frame context; bias toward "remember" at init.
        self.alpha_proj = nn.Dense(
            h, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(4.0))
        self.gate_proj = nn.Dense(h * dv, dtype=self.dtype)
        self.out_proj = nn.Dense(self.out_channels, use_bias=False,
                                 dtype=self.dtype)
        self.o_norm = nn.RMSNorm(dtype=jnp.float32)

    def _qk(self, x_tokens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x_tokens: (..., N, C) → q, k: (..., N, H, dk), unit L2 per head."""
        h, dk = self.num_heads, self.head_dim_k
        q = nn.silu(self.q_proj(x_tokens))
        k = nn.silu(self.k_proj(x_tokens))
        q = _l2norm(q.reshape(*q.shape[:-1], h, dk).astype(jnp.float32))
        k = _l2norm(k.reshape(*k.shape[:-1], h, dk).astype(jnp.float32))
        return q, k

    def _kvb(self, x_tokens: jax.Array,
             mask_embed: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Keys/values/write-gates for a write. mask_embed: (..., N, K1hot)."""
        h, dv = self.num_heads, self.head_dim_v
        _, k = self._qk(x_tokens)
        v = self.v_proj(x_tokens)
        if mask_embed is not None:
            v = v + self.mask_proj(mask_embed.astype(self.dtype))
        v = v.reshape(*v.shape[:-1], h, dv).astype(jnp.float32)
        beta = nn.sigmoid(self.beta_proj(x_tokens).astype(jnp.float32))
        return k, v, beta

    def init_state(self, batch: int) -> jax.Array:
        return gdr.init_state(batch, self.num_heads, self.head_dim_k,
                              self.head_dim_v)

    def prompt_write(self, x_map: jax.Array, mask_onehot: jax.Array,
                     state: jax.Array) -> jax.Array:
        """Write a prompted frame (features + mask) into the memory state.

        This is how first-frame mask conditioning works (memory-VOS lineage,
        reference: README.md:18): the prompt is stored as key→value
        associations retrievable by later frames' queries.

        Args:
          x_map: (B, h, w, C) stride-16 features of the prompt frame.
          mask_onehot: (B, h, w, K) mask downsampled to stride 16, one-hot
            (soft values allowed).
          state: (B, H, dk, dv).
        Returns:
          Updated state (B, H, dk, dv), fp32.
        """
        b, hh, ww, c = x_map.shape
        x_tok = x_map.reshape(b, hh * ww, c)
        m_tok = mask_onehot.reshape(b, hh * ww, -1)
        k, v, beta = self._kvb(x_tok, m_tok)
        # (B, N, H, d) → (B, H, N, d)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        beta = beta.transpose(0, 2, 1)
        return gdr.gdr_write_chunk_bh(state, k, v, beta)

    def __call__(self, x_seq: jax.Array, state: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        """Run the memory over a frame sequence.

        Args:
          x_seq: (B, T, h, w, C) stride-16 feature maps.
          state: (B, H, dk, dv) carried memory state (fp32).
        Returns:
          (readout_seq (B, T, h, w, out_channels) in compute dtype,
           new_state (B, H, dk, dv) fp32).
        """
        b, t, hh, ww, c = x_seq.shape
        n = hh * ww
        h, dk, dv = self.num_heads, self.head_dim_k, self.head_dim_v
        x_tok = x_seq.reshape(b, t, n, c)

        q, k = self._qk(x_tok)                       # (B,T,N,H,dk)
        v = self.v_proj(x_tok)
        v = v.reshape(b, t, n, h, dv)
        # q/k/v enter the recurrence in COMPUTE dtype (bf16): the GDR core
        # upcasts and runs all state math in fp32 regardless, so the only
        # loss is input rounding — the same boundary every other module
        # lives with — while fp32 operands doubled the kernel's per-step
        # DMA (measured 0.96 → 0.69 ms at the saturated serving shape,
        # v5e floor-corrected; quality unchanged on the hard-synth
        # benchmark, BASELINE.md).  Gates stay fp32: they are tiny and
        # β/α precision sets the contraction rate.
        q = q.astype(self.dtype)
        k = k.astype(self.dtype)
        v = v.astype(self.dtype)
        beta = nn.sigmoid(self.beta_proj(x_tok).astype(jnp.float32))
        eta = nn.sigmoid(self.eta_proj(x_tok).astype(jnp.float32)) \
            if self.gdr_variant == "gdn2" else None

        # α: per frame per head from mean-pooled frame features.
        pooled = jnp.mean(x_tok.astype(jnp.float32), axis=2)   # (B,T,C)
        alpha = nn.sigmoid(
            self.alpha_proj(pooled.astype(self.dtype)).astype(jnp.float32))

        # Rearrange to (B, H, T, N, d) for the recurrence core.
        qh = q.transpose(0, 3, 1, 2, 4)
        kh = k.transpose(0, 3, 1, 2, 4)
        vh = v.transpose(0, 3, 1, 2, 4)
        bh = beta.transpose(0, 3, 1, 2)
        ah = alpha.transpose(0, 2, 1)

        impl = self._impl()
        if eta is not None:
            eh = eta.transpose(0, 3, 1, 2)
            if impl == "ref":
                o, new_state = gdr.gdr_ref_ew_bh(qh, kh, vh, bh, ah,
                                                 state, eh)
            elif impl == "pallas":
                o, new_state = gdr_pallas_mod().gdr_pallas_ew_bh(
                    qh, kh, vh, bh, ah, state, eh)
            elif impl == "assoc":
                o, new_state = gdr.gdr_assoc_ew_bh(qh, kh, vh, bh, ah,
                                                   state, eh)
            else:
                o, new_state = gdr.gdr_chunked_ew_bh(qh, kh, vh, bh, ah,
                                                     state, eh)
        elif impl == "ref":
            o, new_state = gdr.gdr_ref_bh(qh, kh, vh, bh, ah, state)
        elif impl == "pallas":
            o, new_state = gdr_pallas_mod().gdr_pallas_bh(
                qh, kh, vh, bh, ah, state)
        elif impl == "assoc":
            o, new_state = gdr.gdr_assoc_bh(qh, kh, vh, bh, ah, state)
        else:
            o, new_state = gdr.gdr_chunked_bh(qh, kh, vh, bh, ah, state)

        # (B,H,T,N,dv) → (B,T,N,H,dv); normalize, gate, project.
        o = o.transpose(0, 2, 3, 1, 4)
        o = self.o_norm(o)                           # RMSNorm over dv (fp32)
        o = o.reshape(b, t, n, h * dv).astype(self.dtype)
        o = o * nn.silu(self.gate_proj(x_tok))
        o = self.out_proj(o)
        return o.reshape(b, t, hh, ww, self.out_channels), new_state
