"""Cortex recurrent-cell library (JAX / flax.linen).

TPU-native re-design of the reference cortex package
(``packages/cortex/src/cortex/cells/`` + ``blocks/`` + ``stacks/auto.py``):
the same cell zoo — Axon (streaming RTU), sLSTM, mLSTM, Transformer-XL,
AGaLiTe, LSTM, causal conv — composed into Column layers ("AXMS" patterns)
with a global-context router, exactly as the reference's default ViT core
uses (``agent/src/metta/agent/policies/vit.py:44`` pattern "Ag,A,S").

Design differences from the reference (deliberate, TPU-first):

- **Step-form cells.** Every cell is a single-step update
  ``(x [B,H], state) -> (y [B,H], state')``; the trainer runs time via
  ``lax.scan``. The reference's chunkwise-parallel Triton kernels
  (``kernels/triton/mlstm``) and CUDA streams exist to fight kernel-launch
  overhead on GPUs; under XLA the whole scan body fuses, so the step form is
  the idiomatic equivalent. (A chunk-parallel Pallas mLSTM is a later perf
  option, not a semantics change.)
- **No eligibility traces.** The reference's Axon/RTU carries forward-mode
  traces (``kernels/pytorch/rtu/rtu_stream_diag.py``) so detached chunk
  boundaries still get cross-boundary credit. Here segments are zero-init
  (reference ``pass_state_during_training=False``) and autodiff runs through
  the in-segment scan, so traces are unnecessary.
- **State is a plain pytree** of fixed-shape arrays, zeroable by
  ``tree.map(zeros_like)`` — which is exactly what the trainer does on
  episode end; every cell's "reset" semantics is zero-state, matching the
  reference's ``reset_state`` masks.

Cell math parity notes are in each class docstring with file:line citations.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# Cell specs: pure-config objects that know their state shapes (so the policy
# can build initial state without binding parameters).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CellSpec:
    """One memory cell. ``kind`` selects the module; fields mirror the
    reference cell configs (``cortex/config.py:18-106``) with their defaults."""

    kind: str                 # axon | slstm | mlstm | xl | agalite | lstm | conv
    hidden: int
    heads: int = 4
    mem_len: int = 128        # xl
    eta: int = 6              # agalite
    r: int = 2                # agalite oscillators
    conv_kernel: int = 4
    activation: str = "identity"   # axon output activation
    r_min: float = 0.0        # axon pole radius range
    r_max: float = 1.0
    max_phase: float = 6.28
    mamba_d_state: int = 16   # mamba SSM state size per channel
    hrm_h_cycles: int = 3     # hrm high-level cycles per step
    hrm_l_cycles: int = 5     # hrm low-level cycles per H cycle
    hrm_expansion: float = 4.0

    def initial_state(self, batch: int) -> Dict[str, jnp.ndarray]:
        H, NH = self.hidden, self.heads
        z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
        if self.kind == "axon":
            return {"hc1": z(batch, H), "hc2": z(batch, H)}
        if self.kind == "lstm":
            return {"c": z(batch, H), "h": z(batch, H)}
        if self.kind == "conv":
            return {"buf": z(batch, max(self.conv_kernel - 1, 0), H)}
        if self.kind == "slstm":
            return {
                "y": z(batch, H), "c": z(batch, H), "n": z(batch, H),
                "m": z(batch, H),
                "conv": z(batch, max(self.conv_kernel - 1, 0), H),
            }
        if self.kind == "mlstm":
            DH = H // NH
            return {
                "C": z(batch, NH, DH, DH), "n": z(batch, NH, DH),
                "m": z(batch, NH),
                "conv": z(batch, max(self.conv_kernel - 1, 0), H),
            }
        if self.kind == "xl":
            return {
                "mem": z(batch, self.mem_len, H),
                "mem_valid": z(batch, self.mem_len),
            }
        if self.kind == "agalite":
            DH = H // NH
            F = self.eta * DH
            return {
                "tilde_k": z(batch, self.r, NH, F),
                "tilde_v": z(batch, self.r, NH, DH),
                "s": z(batch, NH, F),
                "tick": z(batch),
            }
        if self.kind == "mamba":
            d_inner = 2 * H
            return {
                "h": z(batch, d_inner, self.mamba_d_state),
                "conv": z(batch, max(self.conv_kernel - 1, 0), d_inner),
            }
        if self.kind == "hrm":
            return {"z_l": z(batch, H), "z_h": z(batch, H)}
        raise ValueError(f"unknown cell kind {self.kind!r}")

    def make(self, name: str) -> nn.Module:
        cls = {
            "axon": AxonCell, "slstm": SLSTMCell, "mlstm": MLSTMCell,
            "xl": XLCell, "agalite": AGaLiTeCell, "lstm": LSTMCell,
            "conv": CausalConvCell, "mamba": MambaCell, "hrm": HRMCell,
        }[self.kind]
        return cls(spec=self, name=name)


def _act(name: str, x):
    n = name.lower()
    if n in ("silu", "swish"):
        return nn.silu(x)
    if n == "relu":
        return nn.relu(x)
    if n == "tanh":
        return jnp.tanh(x)
    return x  # identity / linear


def _unif(bound: float):
    """Centered uniform initializer on [-bound, bound]."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# Cells
# ---------------------------------------------------------------------------


class AxonCell(nn.Module):
    """Streaming RTU with diagonal dynamics (reference
    ``cells/core/axon_cell.py:41`` + ``kernels/pytorch/rtu/rtu_stream_diag.py``).

    Complex diagonal linear recurrence with learnable pole radius/phase in
    exp-exp parameterization:
        r = exp(-exp(nu_log)), theta = exp(theta_log)
        g = r cos(theta), phi = r sin(theta), gamma = sqrt(1 - r^2)
        c1' = g c1 - phi c2 + gamma w1 xhat
        c2' = g c2 + phi c1 + gamma w2 xhat
        y = out_proj([act(c1'), act(c2')])
    ``xhat`` is an orthogonal-init untraced linear mix of x (the reference's
    ``use_untraced_linear=True`` default, ``config.py:106``).
    """

    spec: CellSpec

    @nn.compact
    def __call__(self, x, state):
        H = self.spec.hidden
        s = self.spec

        def nu_init(key, shape, dtype=jnp.float32):
            u1 = jax.random.uniform(key, shape)
            inner = u1 * (s.r_max**2 - s.r_min**2) + s.r_min**2
            return jnp.log(-0.5 * jnp.log(jnp.clip(inner, 1e-12)))

        def theta_init(key, shape, dtype=jnp.float32):
            u2 = jax.random.uniform(key, shape)
            return jnp.log(jnp.clip(s.max_phase * u2, 1e-12))

        nu_log = self.param("nu_log", nu_init, (H,))
        theta_log = self.param("theta_log", theta_init, (H,))
        bound = 1.0 / math.sqrt(H)
        w1 = self.param("w1", _unif(bound), (H,))
        w2 = self.param("w2", _unif(bound), (H,))

        xhat = nn.Dense(H, use_bias=False, name="input_proj",
                        kernel_init=nn.initializers.orthogonal())(x)

        r = jnp.exp(-jnp.exp(nu_log))
        theta = jnp.exp(theta_log)
        g = r * jnp.cos(theta)
        phi = r * jnp.sin(theta)
        gamma = jnp.sqrt(jnp.clip(1.0 - r * r, 0.0))

        hc1, hc2 = state["hc1"], state["hc2"]
        c1 = g * hc1 - phi * hc2 + gamma * (w1 * xhat)
        c2 = g * hc2 + phi * hc1 + gamma * (w2 * xhat)

        y2h = jnp.concatenate([_act(s.activation, c1), _act(s.activation, c2)], axis=-1)
        y = nn.Dense(H, name="out_proj")(y2h)
        return y, {"hc1": c1, "hc2": c2}


class LSTMCell(nn.Module):
    """Plain LSTM (reference ``cells/lstm.py``)."""

    spec: CellSpec

    @nn.compact
    def __call__(self, x, state):
        cell = nn.OptimizedLSTMCell(self.spec.hidden, name="lstm")
        (c, h), out = cell((state["c"], state["h"]), x)
        return out, {"c": c, "h": h}


class CausalConvCell(nn.Module):
    """Depthwise causal conv1d with a ring-buffer state (reference
    ``cells/conv.py``): step output = sum_k w_k x_{t-K+1+k} + b.

    Sequence mode (x [T, B, H]): one depthwise ``lax.conv`` over the whole
    segment instead of T ring-buffer steps — bit-identical to stepping."""

    spec: CellSpec

    @nn.compact
    def __call__(self, x, state):
        H, K = self.spec.hidden, self.spec.conv_kernel
        w = self.param("kernel", nn.initializers.lecun_normal(), (K, H))
        b = self.param("bias", nn.initializers.zeros, (H,))
        buf = state["buf"]  # [B, K-1, H] of past inputs (oldest first)
        if x.ndim == 3:
            full = jnp.concatenate(
                [buf, jnp.transpose(x, (1, 0, 2))], axis=1
            )                                             # [B, K-1+T, H]
            y = jax.lax.conv_general_dilated(
                full, w[:, None, :],
                window_strides=(1,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=H,
            ) + b                                         # [B, T, H]
            newbuf = full[:, full.shape[1] - max(K - 1, 0):]
            return jnp.transpose(y, (1, 0, 2)), {"buf": newbuf}
        window = jnp.concatenate([buf, x[:, None, :]], axis=1)  # [B, K, H]
        y = jnp.einsum("bkh,kh->bh", window, w) + b
        return y, {"buf": window[:, 1:]}


class SLSTMCell(nn.Module):
    """Structured LSTM with per-head recurrence and stabilized exponential
    gating (reference ``cells/slstm.py:67`` + ``kernels/pytorch/slstm.py:10``).

    i/f gate preactivations come from a causal-conv+SiLU path, z/o from the
    raw input, via per-head block-diagonal linears; recurrence mixes the
    previous output y with a per-head recurrent kernel (zero-init); the
    pointwise update uses the stabilizer state m and normalizer n; output is
    per-head group-normalized.
    """

    spec: CellSpec

    @nn.compact
    def __call__(self, x, state):
        H, NH = self.spec.hidden, self.spec.heads
        DH = H // NH
        B = x.shape[0]

        # causal conv preprocessing for i/f (cells/slstm.py:80-90)
        x_conv, conv_state = CausalConvCell(
            spec=replace(self.spec, kind="conv"), name="conv")(x, {"buf": state["conv"]})
        x_conv = nn.silu(x_conv)

        def headwise(name, inp):
            std = (2.0 / (5.0 * DH)) ** 0.5
            w = self.param(name, nn.initializers.normal(std), (NH, DH, DH))
            return jnp.einsum("bnd,ndf->bnf", inp.reshape(B, NH, DH), w).reshape(B, H)

        i_pre = headwise("igate", x_conv)
        f_pre = headwise("fgate", x_conv)
        z_pre = headwise("zgate", x)
        o_pre = headwise("ogate", x)

        # per-head recurrent kernel, zero-init (slstm.py:110-125)
        R = self.param("recurrent_kernel", nn.initializers.zeros, (NH, 4 * DH, DH))
        y_prev = state["y"].reshape(B, NH, DH)
        Ry = jnp.einsum("bnd,nfd->bnf", y_prev, R)  # [B, NH, 4*DH]
        Ri, Rf, Rz, Ro = jnp.split(Ry, 4, axis=-1)

        def bias_init(key, shape, dtype=jnp.float32):
            # forget-gate bias linspace(3,6) per head; others zero
            b = jnp.zeros(shape)
            return b.at[:, 1].set(jnp.linspace(3.0, 6.0, DH)[None, :].repeat(NH, 0))

        bias = self.param("bias", bias_init, (NH, 4, DH))

        def pre(p, Rh, gi):
            return p.reshape(B, NH, DH) + Rh + bias[:, gi][None]

        iraw = pre(i_pre, Ri, 0)
        fraw = pre(f_pre, Rf, 1)
        zraw = pre(z_pre, Rz, 2)
        oraw = pre(o_pre, Ro, 3)

        c = state["c"].reshape(B, NH, DH)
        n = state["n"].reshape(B, NH, DH)
        m = state["m"].reshape(B, NH, DH)

        logfplusm = m + nn.log_sigmoid(fraw)
        is_first = n == 0.0
        mnew = jnp.where(is_first, iraw, jnp.maximum(iraw, logfplusm))
        ogate = nn.sigmoid(oraw)
        igate = jnp.minimum(jnp.exp(iraw - mnew), 1.0)
        fgate = jnp.minimum(jnp.exp(logfplusm - mnew), 1.0)
        cnew = fgate * c + igate * jnp.tanh(zraw)
        nnew = fgate * n + igate
        ynew = ogate * cnew / (nnew + 1e-6)

        # multi-head groupnorm output (MultiHeadLayerNorm, cells/mlstm.py:35)
        y = ynew.reshape(B, NH, DH)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.var(y, axis=-1, keepdims=True)
        y = (y - mu) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("outnorm_scale", nn.initializers.ones, (H,))
        y = y.reshape(B, H) * scale

        return y, {
            "y": ynew.reshape(B, H), "c": cnew.reshape(B, H),
            "n": nnew.reshape(B, H), "m": mnew.reshape(B, H),
            "conv": conv_state["buf"],
        }


class MLSTMCell(nn.Module):
    """Matrix LSTM recurrent step (reference ``cells/mlstm.py:71`` +
    ``kernels/pytorch/mlstm.py:16`` ``mlstm_recurrent_step_stabilized_simple``).

    q/k come from a causal-conv+SiLU path, v from the raw input; scalar
    per-head input/forget gates from concat(q,k,v); matrix state C with
    stabilizer m and normalizer n; per-head group-norm output.
    """

    spec: CellSpec

    @nn.compact
    def __call__(self, x, state):
        H, NH = self.spec.hidden, self.spec.heads
        DH = H // NH

        def f_bias(key, shape, dtype=jnp.float32):
            return jnp.linspace(3.0, 6.0, shape[0])

        conv = CausalConvCell(spec=replace(self.spec, kind="conv"), name="conv")
        igate = nn.Dense(NH, name="igate", kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.normal(0.1))
        fgate = nn.Dense(NH, name="fgate", kernel_init=nn.initializers.zeros,
                         bias_init=f_bias)
        scale = self.param("outnorm_scale", nn.initializers.ones, (H,))

        def outnorm(h):
            mu = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.var(h, axis=-1, keepdims=True)
            return (h - mu) * jax.lax.rsqrt(var + 1e-5)

        x_conv, conv_state = conv(x, {"buf": state["conv"]})
        x_conv = nn.silu(x_conv)
        gate_in = jnp.concatenate([x_conv, x_conv, x], axis=-1)
        i_pre = igate(gate_in)                      # [..., NH]
        f_pre = fgate(gate_in)

        if x.ndim == 3:
            # sequence mode [T, B, H]: the whole segment goes through the
            # chunkwise-parallel kernel (ops/mlstm_chunkwise.py — the TPU
            # equivalent of the reference Triton kernels,
            # cortex/kernels/triton/mlstm/): within-chunk work becomes MXU
            # einsums; only chunk boundaries recur.
            from metta_tpu.ops.mlstm_chunkwise import mlstm_chunkwise

            T, B = x.shape[0], x.shape[1]
            to_bh = lambda a: jnp.transpose(  # noqa: E731
                a.reshape(T, B, NH, DH), (1, 2, 0, 3))
            q = to_bh(x_conv)
            v = to_bh(x)
            cs = T
            while cs > 64 or (cs > 1 and T % cs):
                cs //= 2
            h, (C_f, n_f, m_f) = mlstm_chunkwise(
                q, q, v,
                jnp.transpose(i_pre, (1, 2, 0)),
                jnp.transpose(f_pre, (1, 2, 0)),
                C0=state["C"], n0=state["n"], m0=state["m"],
                chunk_size=max(cs, 1),
            )                                       # [B, NH, T, DH]
            y = outnorm(h)
            y = jnp.transpose(y, (2, 0, 1, 3)).reshape(T, B, H) * scale
            return y, {"C": C_f, "n": n_f, "m": m_f, "conv": conv_state["buf"]}

        B = x.shape[0]
        q = x_conv.reshape(B, NH, DH)
        k = x_conv.reshape(B, NH, DH)
        v = x.reshape(B, NH, DH)

        C, n, m = state["C"], state["n"], state["m"]
        log_f = nn.log_sigmoid(f_pre)               # [B, NH]
        m_new = jnp.maximum(log_f + m, i_pre)
        fg = jnp.exp(log_f + m - m_new)             # [B, NH]
        ig = jnp.exp(i_pre - m_new)

        k_s = k / math.sqrt(DH)
        C_new = fg[..., None, None] * C + ig[..., None, None] * (
            k_s[..., :, None] * v[..., None, :])   # [B, NH, DH, DH]
        n_new = fg[..., None] * n + ig[..., None] * k_s

        h_num = jnp.einsum("bnd,bndf->bnf", q, C_new)       # [B, NH, DH]
        qn = jnp.einsum("bnd,bnd->bn", q, n_new)            # [B, NH]
        denom = jnp.maximum(jnp.abs(qn), jnp.exp(-m_new)) + 1e-6
        h = h_num / denom[..., None]

        y = outnorm(h).reshape(B, H) * scale
        return y, {"C": C_new, "n": n_new, "m": m_new, "conv": conv_state["buf"]}


class XLCell(nn.Module):
    """Transformer-XL attention step with rolling memory (reference
    ``cells/xl.py:22`` + ``kernels/pytorch/txl.py``): relative-position
    attention with content (u) and position (v) biases; memory slides by one
    per step; a validity mask stands in for the reference's ``mem_seg``
    episode-boundary tracking (zeroed state ⇒ empty memory).
    """

    spec: CellSpec

    @nn.compact
    def __call__(self, x, state):
        H, NH, M = self.spec.hidden, self.spec.heads, self.spec.mem_len
        DH = H // NH
        B = x.shape[0]

        mem, mem_valid = state["mem"], state["mem_valid"]  # [B,M,H], [B,M]
        kv_in = jnp.concatenate([mem, x[:, None, :]], axis=1)  # [B, M+1, H]

        q = nn.Dense(H, name="q_proj", kernel_init=nn.initializers.xavier_uniform())(x)
        k = nn.Dense(H, name="k_proj", kernel_init=nn.initializers.xavier_uniform())(kv_in)
        v = nn.Dense(H, name="v_proj", kernel_init=nn.initializers.xavier_uniform())(kv_in)

        # relative positions: distance M..0 from query to each kv slot
        dist = jnp.arange(M, -1, -1, dtype=jnp.float32)  # [M+1]
        inv = 1.0 / (10000.0 ** (jnp.arange(0, DH, 2, dtype=jnp.float32) / DH))
        ang = dist[:, None] * inv[None, :]
        pos = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [M+1, DH]
        r = nn.Dense(H, use_bias=False, name="r_proj",
                     kernel_init=nn.initializers.xavier_uniform())(
            jnp.tile(pos, (1, NH)))  # [M+1, H]

        u_bias = self.param("u", nn.initializers.zeros, (NH, DH))
        v_bias = self.param("v", nn.initializers.zeros, (NH, DH))

        qh = q.reshape(B, NH, DH)
        kh = k.reshape(B, M + 1, NH, DH)
        vh = v.reshape(B, M + 1, NH, DH)
        rh = r.reshape(M + 1, NH, DH)

        ac = jnp.einsum("bnd,btnd->bnt", qh + u_bias, kh)       # content
        bd = jnp.einsum("bnd,tnd->bnt", qh + v_bias, rh)        # position
        score = (ac + bd) / math.sqrt(DH)                        # [B, NH, M+1]

        valid = jnp.concatenate([mem_valid, jnp.ones((B, 1))], axis=1)  # [B, M+1]
        score = jnp.where(valid[:, None, :] > 0, score, -1e30)
        attn = nn.softmax(score, axis=-1)
        out = jnp.einsum("bnt,btnd->bnd", attn, vh).reshape(B, H)
        y = nn.Dense(H, name="o_proj", kernel_init=nn.initializers.xavier_uniform())(out)

        new_mem = jnp.concatenate([mem[:, 1:], x[:, None, :]], axis=1)
        new_valid = jnp.concatenate([mem_valid[:, 1:], jnp.ones((B, 1))], axis=1)
        return y, {"mem": new_mem, "mem_valid": new_valid}


class AGaLiTeCell(nn.Module):
    """AGaLiTe: feature-mapped linear attention with oscillatory discounted
    state (reference ``cells/agalite.py:21``). Step form of the discounted
    sums: state' = discount * state + input, with per-channel learned gates
    beta/gamma and cos((tick+1)·omega) oscillations over ``r`` frequencies.
    """

    spec: CellSpec

    @nn.compact
    def __call__(self, x, state):
        H, NH, R = self.spec.hidden, self.spec.heads, self.spec.r
        DH = H // NH
        eta = self.spec.eta
        F = eta * DH
        B = x.shape[0]

        ortho = nn.initializers.orthogonal(scale=math.sqrt(2))
        kqvbg = nn.Dense(NH * DH * 5, use_bias=False, name="kqvbg_proj",
                         kernel_init=ortho)(x).reshape(B, NH, 5 * DH)
        k, q, v, beta, gamma = jnp.split(kqvbg, 5, axis=-1)
        beta = nn.sigmoid(beta)
        p123 = nn.Dense(NH * eta * 3, use_bias=False, name="p123_proj",
                        kernel_init=ortho)(x).reshape(B, NH, 3 * eta)
        p1, p2, p3 = jnp.split(p123, 3, axis=-1)

        def feat(a, b, f_a, f_b):
            return jnp.einsum("bhd,bhe->bhde", f_a(a), f_b(b)).reshape(B, NH, F)

        keys_feat = feat(k, p1, nn.relu, nn.relu)
        queries_feat = feat(q, p2, nn.relu, nn.relu)
        gammas_feat = feat(gamma, p3, nn.sigmoid, nn.sigmoid)

        tick = state["tick"]                    # [B]
        omegas = jnp.linspace(-math.pi, math.pi, R)
        cos_t = jnp.cos((tick[:, None] + 1.0) * omegas[None, :])  # [B, R]

        gated_v = v * beta                      # [B, NH, DH]
        gated_k = keys_feat * gammas_feat       # [B, NH, F]
        v_osc = gated_v[:, None] * cos_t[:, :, None, None]   # [B, R, NH, DH]
        k_osc = gated_k[:, None] * cos_t[:, :, None, None]   # [B, R, NH, F]

        d_gamma = 1.0 - gammas_feat             # [B, NH, F]
        d_beta = 1.0 - beta                     # [B, NH, DH]

        tilde_k = d_gamma[:, None] * state["tilde_k"] + k_osc
        tilde_v = d_beta[:, None] * state["tilde_v"] + v_osc
        s_new = d_gamma * state["s"] + gated_k

        kq = jnp.einsum("brhf,bhf->brh", tilde_k, queries_feat)
        kv = jnp.einsum("brhd,brh->bhd", tilde_v, kq)
        norm = jnp.einsum("bhf,bhf->bh", s_new, queries_feat)
        attn = kv / (2 * R * norm[..., None] + 1e-5)

        y = nn.Dense(H, name="out_proj", kernel_init=ortho)(attn.reshape(B, H))
        return y, {"tilde_k": tilde_k, "tilde_v": tilde_v, "s": s_new,
                   "tick": tick + 1.0}


class MambaCell(nn.Module):
    """Selective state-space (Mamba/S6) step cell — the TPU equivalent of the
    reference's mamba backbone (``agent/components/mamba/backbone.py``,
    ``policies/mamba_sliding.py``). Diagonal A, input-dependent Δ/B/C:

        h' = exp(Δ·A)·h + Δ·B(x)·x̃,   y = C(x)·h' + D·x̃,  gated by silu(z)

    with a depthwise causal-conv + SiLU front (standard Mamba block), step
    form over a carried ``h [B, d_inner, N]`` state.
    """

    spec: CellSpec

    @nn.compact
    def __call__(self, x, state):
        H = self.spec.hidden
        d_inner = 2 * H
        N = self.spec.mamba_d_state
        B_ = x.shape[0]

        xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj")(x)
        xi, z = jnp.split(xz, 2, axis=-1)

        conv_spec = replace(self.spec, kind="conv", hidden=d_inner)
        xi, conv_state = CausalConvCell(spec=conv_spec, name="conv")(
            xi, {"buf": state["conv"]})
        xi = nn.silu(xi)

        # input-dependent SSM parameters
        dt_rank = max(H // 16, 1)
        dbc = nn.Dense(dt_rank + 2 * N, use_bias=False, name="x_proj")(xi)
        dt, Bmat, Cmat = jnp.split(dbc, [dt_rank, dt_rank + N], axis=-1)
        dt = nn.softplus(nn.Dense(d_inner, name="dt_proj")(dt))     # [B, d_inner]

        def A_init(key, shape, dtype=jnp.float32):
            return jnp.log(jnp.broadcast_to(
                jnp.arange(1, N + 1, dtype=jnp.float32), shape))
        A_log = self.param("A_log", A_init, (d_inner, N))
        A = -jnp.exp(A_log)                                          # [d_inner, N]
        D = self.param("D", nn.initializers.ones, (d_inner,))

        h = state["h"]                                               # [B, d_inner, N]
        dA = jnp.exp(dt[..., None] * A[None])                        # [B, d_inner, N]
        dBx = dt[..., None] * Bmat[:, None, :] * xi[..., None]       # [B, d_inner, N]
        h = dA * h + dBx
        y = jnp.einsum("bdn,bn->bd", h, Cmat) + D * xi
        y = y * nn.silu(z)
        y = nn.Dense(H, use_bias=False, name="out_proj")(y)
        return y, {"h": h, "conv": conv_state["buf"]}


class HRMCell(nn.Module):
    """Hierarchical Reasoning Model step (reference
    ``agent/components/hrm.py:94``): two-level recurrent reasoning — the low
    module refines ``z_l`` under injection of ``z_h + x`` for ``l_cycles``,
    the high module refines ``z_h`` under injection of ``z_l``, repeated
    ``h_cycles`` times. Blocks are post-norm RMSNorm + SwiGLU (the reference's
    single-token attention reduces to a linear map, folded into the MLP here).
    """

    spec: CellSpec

    @nn.compact
    def __call__(self, x, state):
        H = self.spec.hidden
        d_ff = int(self.spec.hrm_expansion * H)

        def block(name):
            w1 = nn.Dense(d_ff, use_bias=False, name=f"{name}_w1")
            w3 = nn.Dense(d_ff, use_bias=False, name=f"{name}_w3")
            w2 = nn.Dense(H, use_bias=False, name=f"{name}_w2")
            mix = nn.Dense(H, use_bias=False, name=f"{name}_mix")

            def run(h):
                h = _rms(h + mix(h))
                return _rms(h + w2(nn.silu(w1(h)) * w3(h)))
            return run

        def _rms(v):
            return v * jax.lax.rsqrt(jnp.mean(v * v, axis=-1, keepdims=True) + 1e-5)

        L_block = block("L")
        H_block = block("H")
        z_l, z_h = state["z_l"], state["z_h"]
        for _ in range(self.spec.hrm_h_cycles):
            for _ in range(self.spec.hrm_l_cycles):
                z_l = L_block(z_l + z_h + x)
            z_h = H_block(z_h + z_l)
        return z_h, {"z_l": z_l, "z_h": z_h}


# ---------------------------------------------------------------------------
# Blocks (reference cortex/blocks/)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BlockSpec:
    """One stack layer: a cell in a residual wrapper, or a Column of experts."""

    kind: str                       # passthrough | postup | postup_gated | preup | column
    cell: Optional[CellSpec] = None
    experts: Tuple["BlockSpec", ...] = ()
    proj_factor: float = 1.5

    def initial_state(self, batch: int):
        if self.kind == "column":
            return {f"expert_{i}": e.initial_state(batch)
                    for i, e in enumerate(self.experts)}
        return self.cell.initial_state(batch)

    def make(self, name: str) -> nn.Module:
        cls = {
            "passthrough": PassThroughBlock, "postup": PostUpBlock,
            "postup_gated": PostUpGatedBlock, "preup": PreUpBlock,
            "column": ColumnBlock,
        }[self.kind]
        return cls(spec=self, name=name)


class PassThroughBlock(nn.Module):
    """Cell only, no projections (reference ``blocks/passthrough.py``)."""

    spec: BlockSpec

    @nn.compact
    def __call__(self, x, state):
        return self.spec.cell.make("cell")(x, state)


class PostUpBlock(nn.Module):
    """norm → cell → residual; norm → FFN(SiLU) → residual
    (reference ``blocks/postup.py:18``)."""

    spec: BlockSpec

    @nn.compact
    def __call__(self, x, state):
        d = x.shape[-1]
        d_inner = int(self.spec.proj_factor * d)
        y_cell, new_state = self.spec.cell.make("cell")(
            nn.LayerNorm(use_bias=False, name="norm")(x), state)
        y = x + y_cell
        z = nn.LayerNorm(use_bias=False, name="ffn_norm")(y)
        z = nn.Dense(d_inner, name="out1")(z)
        z = nn.Dense(d, name="out2")(nn.silu(z))
        return y + z, new_state


class GRUGate(nn.Module):
    """GTrXL GRU-style gating (reference ``blocks/postup_gated.py:19``)."""

    bg: float = 2.0

    @nn.compact
    def __call__(self, x, y):
        H = x.shape[-1]
        lin = lambda n: nn.Dense(H, use_bias=False, name=n)  # noqa: E731
        r = nn.sigmoid(lin("Wr")(y) + lin("Ur")(x))
        # jnp.full with a python float yields a weak-typed leaf; the first
        # update strengthens it and every downstream jit retraces — pin f32
        bg = self.param("bg", lambda k, s: jnp.full(s, self.bg, jnp.float32), (H,))
        z = nn.sigmoid(lin("Wz")(y) + lin("Uz")(x) - bg)
        h = jnp.tanh(lin("Wg")(y) + lin("Ug")(r * x))
        return (1 - z) * x + z * h


class PostUpGatedBlock(nn.Module):
    """Cell + FFN with GRU-gated residuals (reference ``blocks/postup_gated.py:43``)."""

    spec: BlockSpec

    @nn.compact
    def __call__(self, x, state):
        d = x.shape[-1]
        d_inner = int(self.spec.proj_factor * d)
        y_cell, new_state = self.spec.cell.make("cell")(
            nn.LayerNorm(use_bias=False, name="norm1")(x), state)
        y = GRUGate(name="gate1")(x, y_cell)
        z = nn.LayerNorm(use_bias=False, name="norm2")(y)
        z = nn.Dense(d_inner, name="ffn_in")(z)
        z = nn.Dense(d, name="ffn_out")(nn.silu(z))
        return GRUGate(name="gate2")(y, z), new_state


class PreUpBlock(nn.Module):
    """Project up (proj_factor), run the cell at the inner width, project
    down, residual (reference ``blocks/preup.py:20``; used for mLSTM "M")."""

    spec: BlockSpec

    @nn.compact
    def __call__(self, x, state):
        d = x.shape[-1]
        x_n = nn.LayerNorm(use_bias=False, name="norm")(x)
        up = nn.Dense(self.spec.cell.hidden, name="up_proj")(x_n)
        y_cell, new_state = self.spec.cell.make("cell")(nn.silu(up), state)
        y = nn.Dense(d, name="down_proj")(y_cell)
        return x + y, new_state


class ColumnBlock(nn.Module):
    """Mixture of expert blocks with a global-context router, E-axis
    cross-attention mixer, and ReZero head (reference
    ``blocks/column/column.py:23`` + ``routers.py:22``).

    out = x + α_main·(Σ_k a_k (y_k − u) + (u − x)) + α_col·head(·)
    where u = RMSNorm(x), a = softmax(router logits + λ·refiner(u)).
    """

    spec: BlockSpec

    @nn.compact
    def __call__(self, x, state):
        E = len(self.spec.experts)
        if E == 1:
            y, s0 = self.spec.experts[0].make("expert_0")(x, state["expert_0"])
            return y, {"expert_0": s0}
        H = x.shape[-1]
        u = nn.RMSNorm(name="boundary_norm")(x)

        outs, new_state = [], {}
        for i, espec in enumerate(self.spec.experts):
            y_i, s_i = espec.make(f"expert_{i}")(u, state[f"expert_{i}"])
            outs.append(y_i)
            new_state[f"expert_{i}"] = s_i
        D = jnp.stack([y - u for y in outs], axis=1)  # [B, E, H]

        # E-axis cross-attention mixer, near-identity init (column.py:260)
        tiny = _unif(1e-3)
        Wq = nn.Dense(H, use_bias=False, name="mix_Wq", kernel_init=tiny)
        Wk = nn.Dense(H, use_bias=False, name="mix_Wk", kernel_init=tiny)
        Wv = nn.Dense(H, use_bias=False, name="mix_Wv", kernel_init=tiny)
        Wo = nn.Dense(H, use_bias=False, name="mix_out",
                      kernel_init=nn.initializers.zeros)
        q_bias = self.param("mix_q_bias", tiny, (E, H))
        qm = Wq(u)[:, None, :] + q_bias[None]           # [B, E, H]
        km = Wk(D)                                       # [B, E, H]
        scores = jnp.einsum("beh,bfh->bef", qm, km) / math.sqrt(H)
        D_mixed = D + Wo(jnp.einsum("bef,bfh->beh", nn.softmax(scores, -1), Wv(D)))

        # global-context router (routers.py:22): context·keys softmax gate
        ctx = self.param("router_context", _unif(1e-3), (H,))
        keys = self.param("router_keys", _unif(1e-3), (E, H))
        rWq = nn.Dense(H, use_bias=False, name="router_Wq",
                       kernel_init=nn.initializers.zeros)
        rWk = nn.Dense(H, use_bias=False, name="router_Wk",
                       kernel_init=nn.initializers.zeros)
        g_logits = rWk(keys) @ rWq(ctx) / math.sqrt(H)   # [E]

        # per-token refiner (whisper_lambda=0.1 default, routers.py:80)
        p_t = nn.Dense(E, use_bias=False, name="refiner",
                       kernel_init=nn.initializers.zeros)(u)  # [B, E]
        p_t = p_t - jnp.mean(p_t, axis=-1, keepdims=True)
        a = nn.softmax(g_logits[None] + 0.1 * p_t, axis=-1)   # [B, E]

        y_delta = jnp.einsum("be,beh->bh", a, D_mixed)
        y_minus_x = y_delta + (u - x)
        alpha_main = self.param("alpha_main", nn.initializers.ones, ())
        alpha_col = self.param("alpha_col", nn.initializers.ones, ())
        # ReZero corrective head (2x MLP, zero-init out — column.py:246)
        h = nn.Dense(2 * H, name="head_in")(y_minus_x)
        h = nn.Dense(H, name="head_out", kernel_init=nn.initializers.zeros)(nn.gelu(h))
        return x + alpha_main * y_minus_x + alpha_col * h, new_state


# ---------------------------------------------------------------------------
# Pattern parsing + stack (reference cortex/tokens.py + stacks/auto.py)
# ---------------------------------------------------------------------------

#: token → block builder, mirroring ``cortex/tokens.py`` registrations.
#: "^" (axonified gates) variants map to their base cell: the axon-gate
#: substitution is an intra-cell optimization we don't replicate.
_TOKENS = ("Ag", "A", "X^", "X", "Mb", "M^", "M", "S^", "S", "L", "C", "Hr")


def _token_block(tok: str, d_hidden: int) -> BlockSpec:
    base = tok.rstrip("^")
    if base == "A":
        return BlockSpec("postup", CellSpec("axon", d_hidden))
    if base == "X":
        return BlockSpec("postup_gated", CellSpec("xl", d_hidden))
    if base == "M":
        return BlockSpec("preup", CellSpec("mlstm", 2 * d_hidden), proj_factor=2.0)
    if base == "S":
        return BlockSpec("postup", CellSpec("slstm", d_hidden))
    if base == "L":
        return BlockSpec("passthrough", CellSpec("lstm", d_hidden))
    if base == "C":
        return BlockSpec("passthrough", CellSpec("conv", d_hidden))
    if base == "Ag":
        return BlockSpec("postup_gated", CellSpec("agalite", d_hidden, heads=8))
    if base == "Mb":
        return BlockSpec("passthrough", CellSpec("mamba", d_hidden))
    if base == "Hr":
        return BlockSpec("passthrough", CellSpec("hrm", d_hidden))
    raise ValueError(f"unknown pattern token {tok!r}")


def parse_pattern(pattern: str) -> Tuple[str, ...]:
    """Split "Ag,A,S" or "AXMS" into tokens (reference ``column/auto.py:36``)."""
    s = pattern.replace(",", " ").strip()
    parts = s.split()
    if len(parts) > 1:
        return tuple(parts)
    toks, pos = [], 0
    while pos < len(s):
        for t in _TOKENS:
            if s.startswith(t, pos):
                toks.append(t)
                pos += len(t)
                break
        else:
            raise ValueError(f"unknown token at {pos} in pattern {pattern!r}")
    return tuple(toks)


@dataclass(frozen=True)
class StackSpec:
    """A stack of layers; each layer is a Column over the pattern's experts
    (reference ``build_cortex_auto_config``, ``stacks/auto.py:14``: a str
    pattern is repeated for each of ``num_layers`` Columns)."""

    d_hidden: int
    num_layers: int = 2
    pattern: str = "Ag,A,S"
    post_norm: bool = False

    @property
    def blocks(self) -> Tuple[BlockSpec, ...]:
        toks = parse_pattern(self.pattern)
        experts = tuple(_token_block(t, self.d_hidden) for t in toks)
        if len(experts) == 1:
            return tuple(experts[0] for _ in range(self.num_layers))
        col = BlockSpec("column", experts=experts)
        return tuple(col for _ in range(self.num_layers))

    def initial_state(self, batch: int):
        return {f"block_{i}": b.initial_state(batch)
                for i, b in enumerate(self.blocks)}


def _block_native_sequence(bspec: BlockSpec) -> bool:
    """Blocks whose cell has a parallel whole-sequence implementation; their
    projections/norms broadcast over the leading time dim, so the block can
    consume [T, B, D] in one call."""
    return bspec.kind != "column" and bspec.cell is not None and (
        bspec.cell.kind in ("mlstm", "conv")
    )


class CortexStack(nn.Module):
    """Sequential stack of blocks (reference ``stacks/base.py``); the default
    "Ag,A,S" x2 build matches the reference ViT core
    (``policies/vit.py:44-45``: ``core_resnet_layers=2``).

    Sequence mode (x [T, B, D]): blocks with chunkwise-parallel cells (mLSTM,
    conv) process the whole segment in one call — the reference keeps Triton
    kernels for exactly this (``cortex/kernels/triton/mlstm/``); other blocks
    run one ``nn.scan`` over time with broadcast parameters (a python loop
    here unrolled the block body T times into the learn program — ~800k
    jaxpr eqns at bptt 256 — which the remote-compile helper cannot chew)."""

    spec: StackSpec

    @nn.compact
    def __call__(self, x, state):
        new_state = {}
        if x.ndim == 3:
            def step(mdl, carry, xt):
                y, s2 = mdl(xt, carry)
                return s2, y

            for i, bspec in enumerate(self.spec.blocks):
                blk = bspec.make(f"block_{i}")
                s = state[f"block_{i}"]
                if _block_native_sequence(bspec):
                    x, s = blk(x, s)
                else:
                    s, x = nn.scan(
                        step, variable_broadcast="params",
                        split_rngs={"params": False},
                    )(blk, s, x)
                new_state[f"block_{i}"] = s
            if self.spec.post_norm:
                x = nn.LayerNorm(use_bias=False, name="post_norm")(x)
            return x, new_state
        for i, bspec in enumerate(self.spec.blocks):
            x, s = bspec.make(f"block_{i}")(x, state[f"block_{i}"])
            new_state[f"block_{i}"] = s
        if self.spec.post_norm:
            x = nn.LayerNorm(use_bias=False, name="post_norm")(x)
        return x, new_state

    def initial_state(self, batch: int):
        return self.spec.initial_state(batch)
