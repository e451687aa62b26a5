"""Token observation renderer, MXU formulation (the performance path).

Produces byte-identical output to :func:`metta_tpu.engine.obs.render_observations`
(the reference formulation; parity: ``bindings/mettagrid_c.cpp:397-563``,
``systems/observation_encoder.hpp``) but contains **zero data-dependent
gathers or scatters** — on TPU, XLA lowers generic gathers to ~30 ns/element
scalar loops, which made the gather renderer ~95% of the whole env step.

Formulation (all matmuls are one-hot contractions on the MXU; the agent axis
is folded into the GEMM M dimension so each env issues a few large matmuls
instead of per-agent slivers):

1. *Window read*: a ``[A*S, Hp]`` one-hot row matmul over the zero-padded
   grid planes + a masked column reduce turn every agent's egocentric window
   read (in center-out scan order) into one GEMM per env — no gather.
2. *Block lookup*: an ``[A*S, NB]`` one-hot against the per-env block table
   gives per-cell token planes and token counts in a single GEMM (counts ride
   along as an extra table column).
3. *Compaction*: each cell's tokens start at output slot
   ``start[s] = g_count + cum_excl[s]``. One batched GEMM scatters every
   (cell, k) token straight to its slot:
   ``out[a, t, p] = Σ_{s,k} plane_p[a, s, k] · [start[a, s] + k == t]``.
   (An earlier two-stage form — slot one-hot GEMM then an anti-diagonal
   shifted-slice reduction — was silently miscompiled on real TPU; see the
   inline note at the scatter.)

Exactness: every matmul is a 0/1 one-hot against integer-valued planes
``< 256`` (bf16-exact) accumulated in f32 (exact for ints < 2^24), so the
arithmetic is bit-exact integer arithmetic on the MXU. When a grid plane's
values can reach 256 (huge maps: ``NB >= 256`` block slots or ``A >= 255``
agents), the window matmul switches to f32 @ HIGHEST precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from metta_tpu.engine.obs import (
    EMPTY,
    build_agent_blocks,
    build_assembler_blocks,
    build_chest_blocks,
    build_wall_blocks,
)
from metta_tpu.engine.state import KIND_ASSEMBLER, KIND_CHEST, KIND_WALL
from metta_tpu.engine.xprec import exact_matmuls


def _compact_blocks_mm(blocks, oks, K):
    """Valid-to-front stable compaction via one-hot einsum (no gathers).

    blocks [NB, K, 2] int32, oks [NB, K] → (feat_plane, val_plane [NB, K] f32
    with garbage slots zeroed, counts [NB] int32).
    """
    # rank of slot k = #valid slots before it (valid) — stable compaction
    # order computed by counting, no sort
    oki = oks.astype(jnp.int32)
    rank = jnp.cumsum(oki, axis=1) - oki                       # [NB, K]
    oh = (oks[:, :, None] & (rank[:, :, None] == jnp.arange(K)[None, None, :]))
    counts = jnp.sum(oki, axis=1)
    planes = []
    for c in range(2):
        src = (blocks[:, :, c] % 256)                          # [NB, K]
        comp = jnp.sum(jnp.where(oh, src[:, :, None], 0), axis=1)  # [NB, K]
        planes.append(comp.astype(jnp.float32))
    return planes[0], planes[1], counts


def _global_tokens_all(state, tables, executed_actions, rewards_at_obs,
                       map_center_r, map_center_c, ohr, owr):
    """Global token planes for every agent, compacted via rank one-hot.

    Returns (g_count [A], loc/feat/val planes [A, G]) with G static.
    """
    A = tables.num_agents
    f = tables.feat_id
    center_loc = jnp.float32((ohr << 4) | owr)
    ones = jnp.ones((A,), jnp.float32)
    tru = jnp.ones((A,), bool)
    feats, vals, oks, locs = [], [], [], []
    if tables.global_episode_completion:
        if tables.max_steps > 0:
            pct = jnp.where(
                state.step >= tables.max_steps,
                jnp.int32(255),
                (256 * state.step) // tables.max_steps,
            )
        else:
            pct = jnp.int32(0)
        feats.append(ones * f["episode_completion_pct"])
        vals.append(jnp.broadcast_to(pct.astype(jnp.float32), (A,)))
        oks.append(tru)
        locs.append(ones * center_loc)
    if tables.global_last_action:
        feats.append(ones * f["last_action"])
        vals.append(executed_actions.astype(jnp.float32))
        oks.append(tru)
        locs.append(ones * center_loc)
    if tables.global_last_reward:
        feats.append(ones * f["last_reward"])
        vals.append(jnp.round(rewards_at_obs * 100.0))
        oks.append(tru)
        locs.append(ones * center_loc)
    if tables.global_goal:
        for r in range(tables.num_resources):
            feats.append(ones * f["goal"])
            vals.append(ones * tables.inv_feature_ids[r, 0].astype(jnp.float32))
            oks.append(tables.goal_token_mask[:, r])
            locs.append(ones * center_loc)
    if tables.global_compass:
        sr = jnp.sign(map_center_r - state.agent_r)
        sc = jnp.sign(map_center_c - state.agent_c)
        feats.append(ones * f["agent:compass"])
        vals.append(ones)
        oks.append((sr != 0) | (sc != 0))
        locs.append((((ohr + sr) << 4) | (owr + sc)).astype(jnp.float32))

    G = len(feats)
    if G == 0:
        z = jnp.zeros((A, 1), jnp.float32)
        return jnp.zeros((A,), jnp.int32), z, z, z
    ok = jnp.stack(oks, axis=1)                                 # [A, G]
    oki = ok.astype(jnp.int32)
    rank = jnp.cumsum(oki, axis=1) - oki                        # [A, G]
    # scatter entry g to compacted position rank[g] (one-hot over G positions)
    oh = ok[:, :, None] & (rank[:, :, None] == jnp.arange(G)[None, None, :])
    g_loc = jnp.sum(jnp.where(oh, jnp.stack(locs, 1)[:, :, None], 0), axis=1)
    g_feat = jnp.sum(jnp.where(oh, jnp.stack(feats, 1)[:, :, None], 0), axis=1)
    g_val = jnp.sum(jnp.where(oh, jnp.stack(vals, 1)[:, :, None], 0), axis=1)
    return jnp.sum(oki, axis=1), g_loc, g_feat, g_val


@exact_matmuls
def render_observations_mm(state, tables, executed_actions, rewards_at_obs,
                           _debug=False):
    """Render all agents' token observations → [A, T, 3] uint8.

    Single-env view (vmapped over the env batch by the caller), byte-identical
    to the gather renderer. ``_debug=True`` returns a dict of intermediates
    instead (platform-differential bisection).
    """
    A = tables.num_agents
    T = tables.num_obs_tokens
    K = tables.max_tokens_per_cell
    oh_, ow_ = tables.obs_height, tables.obs_width
    ohr, owr = oh_ // 2, ow_ // 2
    H, W = tables.height, tables.width
    NT = tables.n_object_types

    # ---------------- per-env block table ----------------
    agent_blocks, agent_ok = build_agent_blocks(state, tables)
    wall_blocks, wall_ok = build_wall_blocks(tables)
    if tables.has_assemblers:
        asm_blocks, asm_ok = build_assembler_blocks(state, tables)
    else:
        asm_blocks = jnp.zeros((tables.n_assembler_slots, K, 2), jnp.int32)
        asm_ok = jnp.zeros((tables.n_assembler_slots, K), bool)
    if tables.has_chests:
        chest_blocks, chest_ok = build_chest_blocks(state, tables)
    else:
        chest_blocks = jnp.zeros((tables.n_chest_slots, K, 2), jnp.int32)
        chest_ok = jnp.zeros((tables.n_chest_slots, K), bool)
    none_block = jnp.zeros((1, K, 2), jnp.int32)
    none_ok = jnp.zeros((1, K), bool)
    blocks = jnp.concatenate([none_block, agent_blocks, wall_blocks, asm_blocks, chest_blocks])
    oks = jnp.concatenate([none_ok, agent_ok, wall_ok, asm_ok, chest_ok])
    NB = int(blocks.shape[0])
    comp_feat, comp_val, counts = _compact_blocks_mm(blocks, oks, K)
    off_agent = 1
    off_wall = 1 + A
    off_asm = off_wall + NT
    off_chest = off_asm + tables.n_assembler_slots

    # Per-env grid planes (padded by the window half-extent; pad value 0 is
    # the empty block, which also covers out-of-bounds cells).
    sb = jnp.where(
        state.static_kind == KIND_WALL, off_wall + state.static_type,
        jnp.where(
            state.static_kind == KIND_ASSEMBLER, off_asm + state.static_idx,
            jnp.where(state.static_kind == KIND_CHEST, off_chest + state.static_idx, 0),
        ),
    )
    exact_bf16 = (NB < 256) and (A + 1 < 256)
    gdtype = jnp.bfloat16 if exact_bf16 else jnp.float32
    gprec = None if exact_bf16 else jax.lax.Precision.HIGHEST
    grid2 = jnp.stack([state.agent_grid.astype(gdtype), sb.astype(gdtype)], axis=-1)
    grid2 = jnp.pad(grid2, ((ohr, ohr), (owr, owr), (0, 0)))       # [Hp, Wp, 2]
    Hp, Wp = H + 2 * ohr, W + 2 * owr

    scan_dr = tables.scan_dr
    scan_dc = tables.scan_dc
    S = int(scan_dr.shape[0])
    loc_bytes = (((scan_dr + ohr) << 4) | (scan_dc + owr)).astype(jnp.float32)
    comp_plus = jnp.concatenate(
        [comp_feat, comp_val, counts.astype(jnp.float32)[:, None]], axis=1
    ).astype(jnp.bfloat16)                                          # [NB, 2K+1]
    map_center_r, map_center_c = H // 2, W // 2
    kiota = jnp.arange(K)

    # ---- window read: one [A*S, Hp] GEMM + masked column reduce ----
    rows = state.agent_r[:, None] + scan_dr[None, :] + ohr          # [A, S]
    cols = state.agent_c[:, None] + scan_dc[None, :] + owr          # [A, S]
    row_oh = (rows[:, :, None] == jnp.arange(Hp)[None, None, :]).astype(gdtype)
    tmp = jax.lax.dot_general(
        row_oh.reshape(A * S, Hp), grid2.reshape(Hp, Wp * 2),
        (((1,), (0,)), ((), ())),
        precision=gprec, preferred_element_type=jnp.float32,
    ).reshape(A, S, Wp, 2)
    col_oh = cols[:, :, None] == jnp.arange(Wp)[None, None, :]      # [A, S, Wp]
    win = jnp.sum(jnp.where(col_oh[..., None], tmp, 0.0), axis=2)   # [A, S, 2]
    a_plus1 = win[..., 0].astype(jnp.int32)
    sblock = win[..., 1].astype(jnp.int32)
    block_idx = jnp.where(a_plus1 > 0, off_agent + a_plus1 - 1, sblock)  # [A, S]

    # ---- per-cell token planes + counts in one [A*S, NB] GEMM ----
    boh = (block_idx[:, :, None] == jnp.arange(NB)[None, None, :]).astype(jnp.bfloat16)
    ctk = jax.lax.dot_general(
        boh.reshape(A * S, NB), comp_plus,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(A, S, 2 * K + 1)
    counts_w = ctk[..., -1].astype(jnp.int32)                       # [A, S]
    kmask_w = kiota[None, None, :] < counts_w[:, :, None]           # [A, S, K]
    ctk_loc = jnp.where(kmask_w, loc_bytes[None, :, None], 0.0)     # [A, S, K]

    # ---- output-slot scatter via batched [S, T] start one-hot ----
    g_count, g_loc, g_feat, g_val = _global_tokens_all(
        state, tables, executed_actions, rewards_at_obs,
        map_center_r, map_center_c, ohr, owr,
    )
    cum = jnp.cumsum(counts_w, axis=1)                              # [A, S]
    start = g_count[:, None] + cum - counts_w
    total = g_count + cum[:, -1]
    _dbg = dict(start=start, total=total) if _debug else None
    # f32 + HIGHEST here is a hardware-correctness requirement, not a
    # precision nicety: with bf16 operands this batched dot, when XLA fuses
    # it into the anti-diagonal consumer below, recomputes per-slice with a
    # non-lane-aligned S contraction and produced corrupted rows on real TPU
    # (extra shifted contributions; CPU and the unfused TPU program agree).
    # One GEMM scatters every (cell, k) token straight to its output slot:
    # out[a, t, p] = Σ_{s,k} plane_p[a, s, k] · [start[a, s] + k == t].
    # The earlier two-stage form (slot one-hot GEMM, then an anti-diagonal
    # pad/shifted-slice/accumulate over k) was SILENTLY MISCOMPILED on real
    # TPU: the dot output was correct, but the same program's shifted-slice
    # reduction of it returned rows with extra contributions (CPU, and
    # host-side numpy on the returned dot output, agree; tried lane- and
    # sublane-major layouts and optimization barriers — all wrong on
    # hardware). Folding the k-shift into the one-hot removes that op class
    # from the program entirely.
    oh2 = (
        (start[:, :, None, None] + kiota[None, None, :, None])
        == jnp.arange(T)[None, None, None, :]
    ).astype(jnp.float32)                                           # [A, S, K, T]
    ctk_planes = jnp.stack(
        [ctk_loc.astype(jnp.float32),
         ctk[..., :K].astype(jnp.float32),
         ctk[..., K:2 * K].astype(jnp.float32)], axis=3
    )                                                               # [A, S, K, 3]
    SK = S * K
    out3 = jax.lax.dot_general(
        oh2.reshape(A, SK, T), ctk_planes.reshape(A, SK, 3),
        (((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                               # [A, T, 3]
    obj_loc, obj_feat, obj_val = out3[..., 0], out3[..., 1], out3[..., 2]

    # ---- merge globals (disjoint slots) + validity mask ----
    Gp = int(g_loc.shape[1])
    pad_g = (lambda x: jnp.pad(x, ((0, 0), (0, T - Gp)))) if Gp < T else (
        lambda x: x[:, :T]
    )
    loc_t = pad_g(g_loc) + obj_loc
    feat_t = pad_g(g_feat) + obj_feat
    val_t = pad_g(g_val) + obj_val
    valid = jnp.arange(T)[None, :] < total[:, None]
    out = jnp.stack(
        [loc_t.astype(jnp.int32).astype(jnp.uint8),
         feat_t.astype(jnp.int32).astype(jnp.uint8),
         val_t.astype(jnp.int32).astype(jnp.uint8)],
        axis=-1,
    )
    if _debug:
        _dbg.update(out3=out3, obj_loc=obj_loc,
                    obj_feat=obj_feat, obj_val=obj_val, loc_t=loc_t,
                    feat_t=feat_t, val_t=val_t, out=out)
        return _dbg
    return jnp.where(valid[:, :, None], out, jnp.uint8(EMPTY))
