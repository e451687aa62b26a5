"""Pallas TPU fused simulation step ("sim mega-kernel").

One kernel resolves the entire interaction span of the batched step —
decode, change_vibe, vibe-triggered attacks/transfers, frozen swaps,
rank-arbitrated moves, assembler and chest station phases, and action
consumption — for a whole block of environments at once. Byte-identical
to ``engine/step_batched.step_env_batched`` (reference hot loop:
``bindings/mettagrid_c.cpp:572-678``); the wrapper :func:`fused_step_full`
mirrors its full state contract.

Why a kernel: under ``vmap`` the XLA step fragments into dozens of small
fusions whose ``[E, A, ...]`` intermediates round-trip HBM with the tiny
trailing dims (A=24, R=10, 8 slots) padded to (8, 128) vector tiles — most
lanes compute nothing. Here the layout is **environments in lanes**: every
per-agent array is ``[A, EL]`` (agents in sublanes, EL=128 envs in lanes),
cross-agent interaction terms are ``[A, A*EL]`` pair-mats, and the whole
span runs from VMEM with full-width integer VPU ops — no HBM traffic
between phases, no one-hot f32 GEMMs, no gathers.

Pair-mat algebra (P[a, t*EL + e] relates actor a to target t in env e):
  - per-target operand:  reshape [A, EL] -> [1, A*EL], broadcast sublanes
  - per-actor operand:   ``pltpu.repeat(x, A, axis=1)`` (lane-block tile)
  - reduce over targets: loop over lane blocks  -> [A, EL]
  - reduce over actors:  sublane sum, reshape back -> [A, EL] (rows = target)
Station gathers/scatters use the same trick over the NA/NC station axes.

All tables are baked as compile-time constants (the fused path requires a
concrete single-task ``Tables``; curriculum multi-task training keeps the
XLA step). Integer math is exact by construction — no f32 contractions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metta_tpu.engine.compiler import ACT_CHANGE_VIBE, ACT_MOVE, ACT_NOOP
from metta_tpu.engine.state import KIND_ASSEMBLER, KIND_CHEST
from metta_tpu.engine.xprec import exact_matmuls

_NEIGHBOR_OFFS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def supports_fused(tables) -> bool:
    """Config gate for the fused kernel (else: the XLA batched step).

    Requires concrete (single-task) tables; the unported tails fall back:
    bump handlers, partial-usage assemblers, chest-stat accounting.
    """
    return bool(
        tables.inv_vector_ok
        and not tables.has_bump_handlers
        and not tables.any_allow_partial
        and not tables.track_chest_stats
        and tables.num_agents <= 32
    )


def _np_statics(tables):
    """Bake every table the kernel reads as host numpy (concrete only)."""
    g = lambda name: np.asarray(getattr(tables, name))
    s = {}
    for name in (
        "action_kind", "action_arg", "action_required", "action_consumed",
        "move_deltas",
        "attack_vibe_mask", "attack_consumed", "attack_defense",
        "attack_defense_mask", "attack_armor_w", "attack_weapon_w",
        "attack_vibe_bonus", "vibe_matches_resource", "attack_actor_delta",
        "attack_target_delta",
        "transfer_vibe_mask", "transfer_required", "transfer_actor_delta",
        "transfer_target_delta",
        "type_max_uses",
        "proto_type", "proto_key", "proto_min_agents", "proto_in",
        "proto_out", "proto_cooldown", "proto_nvibes", "proto_vibe_counts",
        "proto_rank", "proto_valid",
        "uproto_key", "uproto_min_agents", "uproto_in", "uproto_out",
        "uproto_cooldown", "uproto_nvibes", "uproto_vibe_counts",
        "chest_vibe_delta", "chest_vibe_has", "chest_type_inv_class",
        "inv_res_group", "inv_group_base",
        "agent_inv_class",
    ):
        s[name] = g(name)
    # per-agent per-resource limits (singleton groups — see inv_vector_ok)
    cls = s["agent_inv_class"]
    s["lims"] = np.clip(
        np.take_along_axis(s["inv_group_base"][cls], s["inv_res_group"][cls], axis=1),
        0, 65535,
    ).astype(np.int32)
    # per-chest-type limit rows [NT, R]
    ccls = s["chest_type_inv_class"]
    s["chest_lims"] = np.clip(
        np.take_along_axis(s["inv_group_base"][ccls], s["inv_res_group"][ccls], axis=1),
        0, 65535,
    ).astype(np.int32)
    return s


def _tdiv_small(a, n):
    """C-style trunc division of i32 ``a`` by i32 ``n`` in [1, 8], exact.

    |a| fits f32 exactly (< 2^23 here); one ±1 fixup corrects the f32
    divide's rounding. Mirrors ``engine/inventory.trunc_div``.
    """
    aa = jnp.abs(a)
    q0 = (aa.astype(jnp.float32) / n.astype(jnp.float32)).astype(jnp.int32)
    r0 = aa - q0 * n
    q = q0 + (r0 >= n).astype(jnp.int32) - (r0 < 0).astype(jnp.int32)
    return jnp.where(a >= 0, q, -q)


def _isign(x):
    return jnp.where(x > 0, 1, jnp.where(x < 0, -1, 0)).astype(jnp.int32)


def build_fused_kernel(tables, EL: int):
    """Returns the kernel fn specialized to this config + block width."""
    S = _np_statics(tables)
    A = int(tables.num_agents)
    R = int(tables.num_resources)
    V = int(tables.num_vibes)
    H, W = int(tables.height), int(tables.width)
    NACT = int(tables.n_actions)
    NA = int(tables.n_assembler_slots)
    NC = int(tables.n_chest_slots)
    NT = int(S["type_max_uses"].shape[0])
    NP = int(tables.n_protocols)
    NUP = int(tables.n_unclip_protocols)
    PR = tuple(tables.proto_res)
    Rp = len(PR)
    AEL = A * EL

    has_attack = tables.has_attack
    has_transfer = tables.has_transfer
    has_swap = tables.has_swap
    has_asm = tables.has_assemblers
    has_chest = tables.has_chests
    track_gained = tables.track_gained
    any_action_consumed = tables.any_action_consumed
    any_action_required = bool(S["action_required"].any())
    defense_any = tables.attack_defense_any
    atk_freeze = int(tables.attack_freeze)
    loot_ids = tuple(tables.loot_ids)
    i32 = jnp.int32

    lims_np = S["lims"]                                  # [A, R] host

    def kernel(act_ref, rank_ref, r0_ref, c0_ref, vibe0_ref, frozen0_ref,
               pk_ref, inv_ref, step_ref, asmf_ref, chf_ref, chinv_ref,
               outa_ref, outinv_ref, outgl_ref, outasm_ref, outchinv_ref):
        # ---------- pair-mat helpers ----------
        def bT(x):  # per-target operand -> [A, A*EL]
            return jnp.broadcast_to(jnp.reshape(x, (1, AEL)), (A, AEL))

        def bA(x):  # per-actor operand -> [A, A*EL]
            return pltpu.repeat(x, A, 1)

        def red_t_sum(P):
            acc = P[:, :EL]
            for t in range(1, A):
                acc = acc + P[:, t * EL:(t + 1) * EL]
            return acc

        def red_t_or(P):
            acc = P[:, :EL]
            for t in range(1, A):
                acc = acc | P[:, t * EL:(t + 1) * EL]
            return acc

        def red_t_min(P):
            acc = P[:, :EL]
            for t in range(1, A):
                acc = jnp.minimum(acc, P[:, t * EL:(t + 1) * EL])
            return acc

        def red_a_sum(P):  # sum over actors -> rows indexed by target
            return jnp.reshape(jnp.sum(P, axis=0, keepdims=True), (A, EL))

        # bool constants via iota compares: Mosaic rejects dense i1 constants
        # (i8 -> i1 trunci), so TRUE/FALSE masks are built from integer iotas
        _io_a = jax.lax.broadcasted_iota(i32, (A, EL), 0)
        TRUE_A = _io_a >= 0
        FALSE_A = _io_a < 0
        _io_c = jax.lax.broadcasted_iota(i32, (NC, EL), 0)
        FALSE_C = _io_c < 0

        def lut1(table_np, idx, n):
            out = jnp.zeros(idx.shape, i32)
            for k in range(n):
                tv = int(table_np[k])
                if tv != 0:
                    out = jnp.where(idx == k, tv, out)
            return out

        def lutb(table_np, idx, n):
            out = FALSE_A
            for k in range(n):
                if bool(table_np[k]):
                    out = out | (idx == k)
            return out

        def lim_row(r):
            """Per-agent limit column for resource r as an [A, EL] const."""
            col = lims_np[:, r]
            if (col == col[0]).all():
                return jnp.full((A, EL), int(col[0]), i32)
            out = jnp.zeros((A, EL), i32)
            rowid = jax.lax.broadcasted_iota(i32, (A, EL), 0)
            for a in range(A):
                if int(col[a]):
                    out = out + jnp.where(rowid == a, int(col[a]), 0)
            return out

        LIM = [lim_row(r) for r in range(R)]

        rank = rank_ref[...]
        r0 = r0_ref[...]
        c0 = c0_ref[...]
        act_in = act_ref[...]
        step1 = jnp.broadcast_to(step_ref[...], (A, EL))

        inv = [inv_ref[r] for r in range(R)]             # list of [A, EL]
        gained = [jnp.zeros((A, EL), i32) for _ in range(R)] if track_gained else None
        lost = [jnp.zeros((A, EL), i32) for _ in range(R)] if track_gained else None

        state = {}

        def clip_write(delta):
            """inv = clip(inv + delta, 0, lims), tracking net gained/lost."""
            nonlocal inv
            new = [jnp.clip(inv[r] + delta[r], 0, LIM[r]) for r in range(R)]
            if track_gained:
                for r in range(R):
                    d = new[r] - inv[r]
                    gained[r] = gained[r] + jnp.maximum(d, 0)
                    lost[r] = lost[r] + jnp.maximum(-d, 0)
            inv = new

        # ---------- decode ----------
        act_ok = (act_in >= 0) & (act_in < NACT)
        act = jnp.clip(act_in, 0, NACT - 1)
        kind = lut1(S["action_kind"], act, NACT)
        arg = lut1(S["action_arg"], act, NACT)
        frozen0 = frozen0_ref[...]
        is_frozen = frozen0 != 0
        frozen = jnp.where(act_ok & is_frozen & (frozen0 > 0), frozen0 - 1, frozen0)
        has_req = TRUE_A
        if any_action_required:
            for r in range(R):
                col = S["action_required"][:, r]
                if col.any():
                    has_req = has_req & (inv[r] >= lut1(col, act, NACT))
        attempt = act_ok & ~is_frozen & has_req
        success = attempt & (kind == ACT_NOOP)

        # ---------- change_vibe ----------
        cv = attempt & (kind == ACT_CHANGE_VIBE)
        vibe = jnp.where(cv, arg, vibe0_ref[...])
        success = success | cv

        # ---------- movement proposals ----------
        movers = attempt & (kind == ACT_MOVE)
        a8 = jnp.clip(arg, 0, 7)
        dr = lut1(S["move_deltas"][:, 0], a8, 8)
        dc = lut1(S["move_deltas"][:, 1], a8, 8)
        r1 = r0 + dr
        c1 = c0 + dc
        in_b = (r1 >= 0) & (r1 < H) & (c1 >= 0) & (c1 < W)
        movers = movers & in_b
        rs = jnp.clip(r1, 0, H - 1)
        cs = jnp.clip(c1, 0, W - 1)
        pk = pk_ref[...]
        skind = jnp.where(movers, pk >> 16, 0)
        sidx = pk & 0xFFFF

        movers_i = movers.astype(i32)
        TM = (bA(r1) == bT(r0)) & (bA(c1) == bT(c0)) & (bA(movers_i) != 0)
        has_tgt = red_t_or(TM)
        TMi = TM.astype(i32)
        tgt = jnp.zeros((A, EL), i32)
        for t in range(1, A):
            tgt = tgt + TMi[:, t * EL:(t + 1) * EL] * t   # argmax ≡ sum (≤1 hit)

        vibe_c = jnp.clip(vibe, 0, V - 1)

        def from_targets(x):
            return red_t_sum(bT(x) * TMi)

        def sum_to_targets(vals, mask):
            return red_a_sum(bA(vals * mask.astype(i32)) * TMi)

        def winner_per_target(cands):
            score = jnp.where(cands, rank, A + 1)
            sameT = bA(tgt) == bT(tgt)
            P = jnp.where(sameT & (bT(cands.astype(i32)) != 0), bT(score), A + 1)
            best = red_t_min(P)
            return cands & (score == best)

        # ---------- vibe-triggered attacks ----------
        handled_attack = FALSE_A
        if has_attack:
            wants = movers & lutb(S["attack_vibe_mask"], vibe_c, V) & has_tgt
            afford = TRUE_A
            for r in range(R):
                cr = int(S["attack_consumed"][r])
                if cr:
                    afford = afford & (inv[r] >= cr)
            valid = wants & (from_targets(frozen) <= 0) & afford
            valid = winner_per_target(valid)

            weapon = jnp.zeros((A, EL), i32)
            for r in range(R):
                wr = int(S["attack_weapon_w"][r])
                if wr:
                    weapon = weapon + inv[r] * wr
            t_vibe = from_targets(vibe_c)
            vibe_bonus = lut1(S["attack_vibe_bonus"], t_vibe, V)
            inv_t = [from_targets(inv[r]) for r in range(R)]
            armor = jnp.zeros((A, EL), i32)
            for r in range(R):
                aw = int(S["attack_armor_w"][r])
                if aw:
                    amt = inv_t[r]
                    col = S["vibe_matches_resource"][:, r]
                    if col.any():
                        amt = amt + jnp.where(lutb(col, t_vibe, V), vibe_bonus, 0)
                    armor = armor + amt * aw
            bonus = jnp.maximum(weapon - armor, 0)

            if defense_any:
                can_defend = TRUE_A
                req = {}
                for r in range(R):
                    if bool(S["attack_defense_mask"][r]):
                        req[r] = int(S["attack_defense"][r]) + bonus
                        can_defend = can_defend & (inv_t[r] >= req[r])
                blocked = valid & can_defend
                new = list(inv)
                for r, rq in req.items():
                    d_t = sum_to_targets(-rq, blocked)
                    new[r] = jnp.clip(inv[r] + d_t, 0, LIM[r])
                if track_gained:
                    for r in range(R):
                        lost[r] = lost[r] + jnp.maximum(inv[r] - new[r], 0)
                inv = new
            else:
                blocked = FALSE_A

            hit = valid & ~blocked
            hit_i = hit.astype(i32)
            if atk_freeze > 0:
                frozen = frozen + red_a_sum(bA(hit_i) * TMi) * atk_freeze
            d = [jnp.zeros((A, EL), i32) for _ in range(R)]
            for r in range(R):
                ad = int(S["attack_actor_delta"][r])
                td = int(S["attack_target_delta"][r])
                if ad:
                    d[r] = d[r] + hit_i * ad
                if td:
                    d[r] = d[r] + red_a_sum(bA(hit_i) * TMi) * td
            for r_loot in loot_ids:
                amount = from_targets(inv[r_loot])
                space = jnp.maximum(LIM[r_loot] - inv[r_loot], 0)
                stolen = jnp.where(hit, jnp.minimum(amount, space), 0)
                d[r_loot] = d[r_loot] + stolen - sum_to_targets(stolen, hit)
            valid_i = valid.astype(i32)
            for r in range(R):
                cr = int(S["attack_consumed"][r])
                if cr:
                    d[r] = d[r] - valid_i * cr
            clip_write(d)
            success = success | valid
            handled_attack = valid

        # ---------- vibe-triggered transfers ----------
        handled_tr = FALSE_A
        if has_transfer:
            wants_tr = (
                movers & ~handled_attack
                & lutb(S["transfer_vibe_mask"], vibe_c, V) & has_tgt
            )
            d_actor = [lut1(S["transfer_actor_delta"][:, r], vibe_c, V)
                       for r in range(R)]
            d_target = [lut1(S["transfer_target_delta"][:, r], vibe_c, V)
                        for r in range(R)]
            req_ok = TRUE_A
            for r in range(R):
                tr = int(S["transfer_required"][r])
                if tr:
                    req_ok = req_ok & (inv[r] >= tr)
            valid = wants_tr & (from_targets(frozen) <= 0) & req_ok
            valid = winner_per_target(valid)
            ok = valid
            for r in range(R):
                free_a = jnp.maximum(LIM[r] - inv[r], 0)
                ok = ok & ((d_actor[r] >= 0) | (inv[r] >= -d_actor[r]))
                ok = ok & ((d_target[r] >= 0) | (from_targets(inv[r]) >= -d_target[r]))
                ok = ok & ((d_actor[r] <= 0) | (d_actor[r] <= free_a))
                ok = ok & ((d_target[r] <= 0) | (d_target[r] <= from_targets(free_a)))
            ok_i = ok.astype(i32)
            d = [d_actor[r] * ok_i + red_a_sum(bA(d_target[r] * ok_i) * TMi)
                 for r in range(R)]
            clip_write(d)
            success = success | ok
            handled_tr = ok

        # ---------- swaps with frozen agents ----------
        handled_station = FALSE_A
        cur_r, cur_c = r0, c0
        if has_swap:
            wants_swap = (
                movers & ~handled_attack & ~handled_tr & has_tgt
                & (from_targets(frozen) > 0)
            )
            swap_ok = winner_per_target(wants_swap)
            swapped_in = red_a_sum(bA(swap_ok.astype(i32)) * TMi) != 0
            new_r = jnp.where(swap_ok, from_targets(r0), r0)
            new_c = jnp.where(swap_ok, from_targets(c0), c0)
            new_r = jnp.where(swapped_in, sum_to_targets(r0, swap_ok), new_r)
            new_c = jnp.where(swapped_in, sum_to_targets(c0, swap_ok), new_c)
            cur_r, cur_c = new_r, new_c
            success = success | swap_ok
            handled_station = handled_station | wants_swap

        interacted = handled_attack | handled_tr | handled_station

        # ---------- plain moves: rank-arbitrated rounds ----------
        plain = movers & ~interacted & (skind == 0)
        unresolved = plain
        moved = FALSE_A
        cell = rs * W + cs
        sameC = bA(cell) == bT(cell)
        row_ne_blk = jax.lax.broadcasted_iota(i32, (A, AEL), 0) != (
            jax.lax.broadcasted_iota(i32, (A, AEL), 1) // EL
        )
        for _round in range(4):
            occ = (bA(r1) == bT(cur_r)) & (bA(c1) == bT(cur_c)) & row_ne_blk
            occ_any = red_t_or(occ)
            blocker_later = red_t_or(occ & (bT(rank) > bA(rank)))
            stuck_i = (~unresolved & ~moved).astype(i32)
            blocker_stuck = red_t_or(occ & (bT(stuck_i) != 0))
            fail_now = unresolved & (blocker_later | blocker_stuck)
            unresolved = unresolved & ~fail_now
            score = jnp.where(unresolved, rank, A + 1)
            P = jnp.where(sameC & (bT(unresolved.astype(i32)) != 0),
                          bT(score), A + 1)
            best = red_t_min(P)
            wins = unresolved & (score == best) & ~occ_any
            cur_r = jnp.where(wins, r1, cur_r)
            cur_c = jnp.where(wins, c1, cur_c)
            moved = moved | wins
            unresolved = unresolved & ~wins
        success = success | moved

        # ---------- station winner (per sidx among one bump kind) ----------
        def station_winner(bump):
            score = jnp.where(bump, rank, A + 1)
            sameS = bA(sidx) == bT(sidx)
            P = jnp.where(sameS & (bT(bump.astype(i32)) != 0), bT(score), A + 1)
            best = red_t_min(P)
            return bump & (score == best)

        asm_type = asmf_ref[0]
        asm_uses = asmf_ref[1]
        asm_cd_end = asmf_ref[2]
        asm_cd_dur = asmf_ref[3]
        asm_clipped = asmf_ref[4]
        asm_uproto = asmf_ref[5]
        asm_valid = asmf_ref[6]

        if has_asm:
            bump_asm = movers & ~interacted & (skind == KIND_ASSEMBLER)
            is_winner = station_winner(bump_asm)
            iw_i = is_winner.astype(i32)

            # --- gather claimed-station fields to winner rows over NA ---
            NAEL = NA * EL
            sblk = jax.lax.broadcasted_iota(i32, (A, NAEL), 1) // EL
            Gi = ((pltpu.repeat(sidx, NA, 1) == sblk)
                  & (pltpu.repeat(iw_i, NA, 1) != 0)).astype(i32)

            def gath_na(fld):                        # [NA, EL] -> [A, EL]
                P = jnp.broadcast_to(jnp.reshape(fld, (1, NAEL)), (A, NAEL)) * Gi
                acc = P[:, :EL]
                for s_ in range(1, NA):
                    acc = acc + P[:, s_ * EL:(s_ + 1) * EL]
                return acc

            c_type = gath_na(asm_type)
            c_uses = gath_na(asm_uses)
            c_cd_end = gath_na(asm_cd_end)
            c_clipped = gath_na(asm_clipped) != 0
            c_uproto = gath_na(asm_uproto + 1) - iw_i   # -1 sentinel survives
            c_valid = gath_na(asm_valid) != 0

            do = is_winner & c_valid
            max_uses = lut1(S["type_max_uses"], c_type, NT)
            ok = do & ((max_uses == 0) | (c_uses < max_uses))
            remaining = jnp.maximum(c_cd_end - step1, 0)
            ok = ok & (remaining == 0)               # allow_partial gated off

            # --- neighbors of the claimed station (at the bump target) ---
            nb_is_agent, nb_idx, nb_vibe, match_o, inb_l = [], [], [], [], []
            for dro, dco in _NEIGHBOR_OFFS:
                rr = rs + dro
                cc = cs + dco
                inb_o = (rr >= 0) & (rr < H) & (cc >= 0) & (cc < W)
                Mi = ((bA(rr) == bT(cur_r)) & (bA(cc) == bT(cur_c))).astype(i32)
                match_o.append(Mi)
                isag = inb_o & (red_t_or(Mi != 0))
                nidx = jnp.zeros((A, EL), i32)
                for t in range(1, A):
                    nidx = nidx + Mi[:, t * EL:(t + 1) * EL] * t
                nvib = jnp.where(isag, red_t_sum(bT(vibe) * Mi), 0)
                nb_is_agent.append(isag)
                nb_idx.append(nidx)
                nb_vibe.append(nvib)
                inb_l.append(inb_o.astype(i32))

            # --- sorted vibe key via counting sort ---
            cum, run = [], jnp.zeros((A, EL), i32)
            for v in range(V):
                c_ = jnp.zeros((A, EL), i32)
                for o in range(8):
                    c_ = c_ + (nb_vibe[o] == v).astype(i32)
                run = run + c_
                cum.append(run)
            key_vec = []
            for j in range(8):
                kv = jnp.zeros((A, EL), i32)
                for v in range(V):
                    kv = kv + (cum[v] <= j).astype(i32)
                key_vec.append(kv)
            n_agents = jnp.zeros((A, EL), i32)
            for o in range(8):
                n_agents = n_agents + nb_is_agent[o].astype(i32)

            # --- protocol selection (protocols.select_protocol / _pick) ---
            def pick(cands_list, ranks):
                best_s = jnp.full((A, EL), -1, i32)
                best_i = jnp.full((A, EL), -1, i32)
                for p, cnd in enumerate(cands_list):
                    sc = jnp.where(cnd, int(ranks[p]), -1)
                    better = sc > best_s
                    best_s = jnp.where(better, sc, best_s)
                    best_i = jnp.where(better, p, best_i)
                return jnp.where(best_s >= 0, best_i, -1)

            cands, cands0 = [], []
            for p in range(NP):
                if not bool(S["proto_valid"][p]):
                    z = FALSE_A
                    cands.append(z)
                    cands0.append(z)
                    continue
                c_p = (c_type == int(S["proto_type"][p])) & (
                    n_agents >= int(S["proto_min_agents"][p])
                )
                exact = c_p
                for j in range(8):
                    exact = exact & (key_vec[j] == int(S["proto_key"][p, j]))
                cands.append(exact)
                cands0.append(
                    c_p if bool((S["proto_key"][p] == 0).all())
                    else FALSE_A
                )
            idx_e = pick(cands, S["proto_rank"])
            idx_0 = pick(cands0, S["proto_rank"])
            p_norm = jnp.where(idx_e >= 0, idx_e, idx_0)

            p_un = jnp.full((A, EL), -1, i32)
            for u in range(NUP):
                oku = (c_uproto == u) & (
                    n_agents >= int(S["uproto_min_agents"][u])
                )
                if not bool((S["uproto_key"][u] == 0).all()):
                    keym = TRUE_A
                    for j in range(8):
                        keym = keym & (key_vec[j] == int(S["uproto_key"][u, j]))
                    allz = TRUE_A
                    for j in range(8):
                        allz = allz & (key_vec[j] == 0)
                    oku = oku & (keym | allz)
                p_un = jnp.where(oku, u, p_un)
            p_idx = jnp.where(c_clipped, p_un, p_norm)
            ok = ok & (p_idx >= 0)

            def proto_field(norm_np, un_np):
                outn = jnp.zeros((A, EL), i32)
                for p in range(NP):
                    vv = int(norm_np[p])
                    if vv:
                        outn = outn + jnp.where(p_norm == p, vv, 0)
                outu = jnp.zeros((A, EL), i32)
                for u in range(NUP):
                    vv = int(un_np[u])
                    if vv:
                        outu = outu + jnp.where(p_un == u, vv, 0)
                return jnp.where(c_clipped, outu, outn)

            inputs = [proto_field(S["proto_in"][:, r], S["uproto_in"][:, r])
                      for r in PR]
            outputs = [proto_field(S["proto_out"][:, r], S["uproto_out"][:, r])
                       for r in PR]
            cooldown = proto_field(S["proto_cooldown"], S["uproto_cooldown"])
            nvibes = proto_field(S["proto_nvibes"], S["uproto_nvibes"])

            # --- rotated neighbor ranks (slot order from the actor's slot) ---
            rank_inb, run2 = [], jnp.zeros((A, EL), i32)
            for o in range(8):
                run2 = run2 + inb_l[o]
                rank_inb.append(run2 - 1)
            n_inb = run2
            start_rank = jnp.zeros((A, EL), i32)
            for o, (dro, dco) in enumerate(_NEIGHBOR_OFFS):
                is_actor_slot = (dro == (cur_r - rs)) & (dco == (cur_c - cs))
                start_rank = start_rank + jnp.where(is_actor_slot, rank_inb[o], 0)
            nim = jnp.maximum(n_inb, 1)
            order_key = []
            for o in range(8):
                x = rank_inb[o] - start_rank + nim * 8   # make non-negative
                rot = x - _tdiv_small(x, nim) * nim
                order_key.append(jnp.where(nb_is_agent[o], rot, 1000 + o))
            slot_rank = []
            for o in range(8):
                sr = jnp.zeros((A, EL), i32)
                for o2 in range(8):
                    if o2 == o:
                        continue
                    lt = order_key[o2] < order_key[o]
                    if o2 < o:
                        lt = lt | (order_key[o2] == order_key[o])
                    sr = sr + lt.astype(i32)
                slot_rank.append(sr)
            ref_idx, ref_valid, v8 = [], [], []
            for p in range(8):
                ri = jnp.zeros((A, EL), i32)
                rv = FALSE_A
                vv = jnp.zeros((A, EL), i32)
                for o in range(8):
                    here = slot_rank[o] == p
                    ri = ri + jnp.where(here, nb_idx[o], 0)
                    rv = rv | (here & nb_is_agent[o])
                    vv = vv + jnp.where(here, nb_vibe[o], 0)
                ref_idx.append(ri)
                ref_valid.append(rv)
                v8.append(vv)

            # --- output-slot selection (occurrence-index trick) ---
            sel = []
            for p in range(8):
                v8c = jnp.clip(v8[p], 0, V - 1)
                cv_ = jnp.zeros((A, EL), i32)
                for v in range(V):
                    col_n = S["proto_vibe_counts"][:, v]
                    col_u = S["uproto_vibe_counts"][:, v]
                    if col_n.any() or col_u.any():
                        fv = proto_field(col_n, col_u)
                        cv_ = cv_ + jnp.where(v8c == v, fv, 0)
                occ_idx = jnp.zeros((A, EL), i32)
                for p2 in range(p):
                    occ_idx = occ_idx + (v8[p2] == v8[p]).astype(i32)
                sel.append(ref_valid[p] & (v8[p] != 0) & (occ_idx < cv_))
            any_sel = FALSE_A
            for p in range(8):
                any_sel = any_sel | sel[p]
            use_multi = (nvibes > 1) & any_sel
            self_idx = jax.lax.broadcasted_iota(i32, (A, EL), 0)
            # (select_n on i1 vectors lowers through an unsupported i8
            # truncation in Mosaic — express bool selects as boolean algebra)
            out_idx = [jnp.where(use_multi, ref_idx[p], self_idx) for p in range(8)]
            out_val = [
                (use_multi & sel[p]) | (~use_multi if p == 0 else FALSE_A)
                for p in range(8)
            ]

            # --- slot inventory/limit rows (zeroed when slot invalid) ---
            blkid = jax.lax.broadcasted_iota(i32, (A, AEL), 1) // EL

            def slot_rows(idxs, vals):
                rows = [[None] * Rp for _ in range(8)]
                lrows = [[None] * Rp for _ in range(8)]
                masks = []
                for o in range(8):
                    Mo = ((bA(idxs[o]) == blkid)
                          & (bA(vals[o].astype(i32)) != 0)).astype(i32)
                    masks.append(Mo)
                    for ri, r in enumerate(PR):
                        rows[o][ri] = red_t_sum(bT(inv[r]) * Mo)
                        lrows[o][ri] = red_t_sum(bT(LIM[r]) * Mo)
                return rows, lrows, masks

            in_rows, in_lims, in_masks = slot_rows(ref_idx, ref_valid)
            out_rows, out_lims, out_masks = slot_rows(out_idx, out_val)

            # --- totals / absorb checks ---
            for ri in range(Rp):
                tot = jnp.zeros((A, EL), i32)
                for o in range(8):
                    tot = tot + in_rows[o][ri]
                ok = ok & ((inputs[ri] == 0) | (tot >= inputs[ri]))
            has_output = FALSE_A
            can_absorb = FALSE_A
            for ri in range(Rp):
                tfree = jnp.zeros((A, EL), i32)
                for o in range(8):
                    tfree = tfree + jnp.maximum(out_lims[o][ri] - out_rows[o][ri], 0)
                has_output = has_output | (outputs[ri] > 0)
                can_absorb = can_absorb | ((outputs[ri] > 0) & (tfree >= 1))
            ok = ok & (~has_output | can_absorb | c_clipped)

            # --- shared_update fixpoint on local slot copies ---
            def shared_consume(rows, lim_rows, valids, delta):
                applied = [[jnp.zeros((A, EL), i32) for _ in range(Rp)]
                           for _ in range(8)]
                active = [[valids[o] & (delta[ri] != 0) for ri in range(Rp)]
                          for o in range(8)]
                delta_rem = list(delta)
                n_rem = []
                for ri in range(Rp):
                    n_ = jnp.zeros((A, EL), i32)
                    for o in range(8):
                        n_ = n_ + active[o][ri].astype(i32)
                    n_rem.append(n_)
                for _pass in range(3):
                    for ri in range(Rp):
                        per = jnp.where(
                            n_rem[ri] > 0,
                            _tdiv_small(delta_rem[ri], jnp.maximum(n_rem[ri], 1)),
                            0,
                        )
                        tk = jnp.zeros((A, EL), i32)
                        kk = jnp.zeros((A, EL), i32)
                        for o in range(8):
                            cur = rows[o][ri]
                            free = jnp.maximum(lim_rows[o][ri] - cur, 0)
                            ap = applied[o][ri]
                            pos = delta_rem[ri] > 0
                            kick = active[o][ri] & (
                                (pos & ((free - ap) <= per))
                                | (~pos & ((cur + ap) <= -per))
                            )
                            take = jnp.clip(
                                jnp.where(kick, per, 0), -(cur + ap), free - ap
                            )
                            applied[o][ri] = ap + take
                            tk = tk + take
                            kk = kk + kick.astype(i32)
                            active[o][ri] = active[o][ri] & ~kick
                        delta_rem[ri] = delta_rem[ri] - tk
                        n_rem[ri] = n_rem[ri] - kk
                out = [[None] * Rp for _ in range(8)]
                for ri in range(Rp):
                    base = jnp.where(
                        n_rem[ri] > 0,
                        _tdiv_small(delta_rem[ri], jnp.maximum(n_rem[ri], 1)),
                        0,
                    )
                    surplus = delta_rem[ri] - base * n_rem[ri]
                    sgn = _isign(surplus)
                    sab = jnp.abs(surplus)
                    runr = jnp.zeros((A, EL), i32)
                    for o in range(8):
                        runr = runr + active[o][ri].astype(i32)
                        extra = jnp.where((runr - 1) < sab, sgn, 0)
                        fin = jnp.where(active[o][ri], base + extra, 0)
                        cur = rows[o][ri]
                        ap = applied[o][ri]
                        fin = jnp.clip(
                            fin, -(cur + ap),
                            jnp.maximum(lim_rows[o][ri] - cur, 0) - ap,
                        )
                        out[o][ri] = ap + fin
                return out

            ok_i32 = ok.astype(i32)
            in_d = shared_consume(
                in_rows, in_lims, ref_valid,
                [-inputs[ri] * ok_i32 for ri in range(Rp)],
            )
            out_d = shared_consume(
                out_rows, out_lims, out_val,
                [outputs[ri] * ok_i32 for ri in range(Rp)],
            )

            # --- scatter slot deltas to agents, one clamped write ---
            d_full = [jnp.zeros((A, EL), i32) for _ in range(R)]
            for o in range(8):
                for ri, r in enumerate(PR):
                    d_full[r] = d_full[r] + red_a_sum(bA(in_d[o][ri]) * in_masks[o])
                    d_full[r] = d_full[r] + red_a_sum(bA(out_d[o][ri]) * out_masks[o])
            clip_write(d_full)

            # --- station write-back over NA ---
            rowid_s = jax.lax.broadcasted_iota(i32, (NA, AEL), 0)
            okf = jnp.broadcast_to(jnp.reshape(ok_i32, (1, AEL)), (NA, AEL))
            SMi = ((jnp.broadcast_to(jnp.reshape(sidx, (1, AEL)), (NA, AEL))
                    == rowid_s) & (okf != 0)).astype(i32)

            def red_agents_sum(P, n_rows):
                acc = P[:, :EL]
                for a_ in range(1, A):
                    acc = acc + P[:, a_ * EL:(a_ + 1) * EL]
                return acc

            ok_na = red_agents_sum(SMi, NA) != 0
            cd_flat = jnp.broadcast_to(jnp.reshape(cooldown, (1, AEL)), (NA, AEL))
            cooldown_na = red_agents_sum(cd_flat * SMi, NA)
            unclip_now = ok_na & (asm_clipped != 0)
            step_na = jnp.broadcast_to(step_ref[...], (NA, EL))
            asm_cd_dur = jnp.where(ok_na, cooldown_na, asm_cd_dur)
            asm_cd_end = jnp.where(ok_na, step_na + cooldown_na, asm_cd_end)
            asm_uses = asm_uses + jnp.where(ok_na & (asm_clipped == 0), 1, 0)
            asm_uproto = jnp.where(unclip_now, -1, asm_uproto)
            asm_clipped = jnp.where(unclip_now, 0, asm_clipped)
            success = success | (is_winner & ok)

        # ---------- chest phase ----------
        chinv = [chinv_ref[r] for r in range(R)]
        if has_chest:
            ch_type = chf_ref[0]
            ch_valid = chf_ref[1] != 0
            bump_ch = movers & ~interacted & (skind == KIND_CHEST)
            is_winner_c = station_winner(bump_ch)
            iwc_i = is_winner_c.astype(i32)
            rowid_c = jax.lax.broadcasted_iota(i32, (NC, AEL), 0)
            CMi = ((jnp.broadcast_to(jnp.reshape(sidx, (1, AEL)), (NC, AEL))
                    == rowid_c)
                   & (jnp.broadcast_to(jnp.reshape(iwc_i, (1, AEL)),
                                       (NC, AEL)) != 0)).astype(i32)

            def red_agents_c(P):
                acc = P[:, :EL]
                for a_ in range(1, A):
                    acc = acc + P[:, a_ * EL:(a_ + 1) * EL]
                return acc

            def gath_agents(x):                      # [A, EL] -> [NC, EL]
                return red_agents_c(
                    jnp.broadcast_to(jnp.reshape(x, (1, AEL)), (NC, AEL)) * CMi
                )

            claimed = red_agents_c(CMi) != 0
            a_vibe = gath_agents(vibe)
            a_inv = [gath_agents(inv[r]) for r in range(R)]
            a_lim = [gath_agents(LIM[r]) for r in range(R)]
            vc = jnp.clip(a_vibe, 0, V - 1)
            has = FALSE_C
            deltas = [jnp.zeros((NC, EL), i32) for _ in range(R)]
            c_lim = [jnp.zeros((NC, EL), i32) for _ in range(R)]
            for t in range(NT):
                tm = ch_type == t
                hv = FALSE_C
                for v in range(V):
                    if bool(S["chest_vibe_has"][t, v]):
                        hv = hv | (vc == v)
                has = has | (tm & hv)
                for r in range(R):
                    col = S["chest_vibe_delta"][t, :, r]
                    if col.any():
                        dv = jnp.zeros((NC, EL), i32)
                        for v in range(V):
                            if int(col[v]):
                                dv = dv + jnp.where(vc == v, int(col[v]), 0)
                        deltas[r] = deltas[r] + jnp.where(tm, dv, 0)
                    cl = int(S["chest_lims"][t, r])
                    if cl:
                        c_lim[r] = c_lim[r] + jnp.where(tm, cl, 0)
            okc = claimed & ch_valid & has
            agent_d = [None] * R
            any_tr = FALSE_C
            new_chinv = [None] * R
            for r in range(R):
                give_dep = jnp.where((deltas[r] > 0) & okc,
                                     jnp.minimum(a_inv[r], deltas[r]), 0)
                got_dep = jnp.minimum(
                    give_dep, jnp.maximum(c_lim[r] - chinv[r], 0)
                )
                give_w = jnp.where((deltas[r] < 0) & okc,
                                   jnp.minimum(chinv[r], -deltas[r]), 0)
                got_w = jnp.minimum(give_w, jnp.maximum(a_lim[r] - a_inv[r], 0))
                agent_d[r] = got_w - give_dep
                new_chinv[r] = jnp.clip(chinv[r] + got_dep - give_w, 0, 65535)
                any_tr = any_tr | (got_dep > 0) | (got_w > 0)
            ok_v = okc & any_tr
            chinv = new_chinv
            d_back = [
                jnp.reshape(
                    jnp.sum(pltpu.repeat(agent_d[r], A, 1) * CMi,
                            axis=0, keepdims=True),
                    (A, EL),
                )
                for r in range(R)
            ]
            clip_write(d_back)
            succ_c = jnp.reshape(
                jnp.sum(pltpu.repeat(ok_v.astype(i32), A, 1) * CMi,
                        axis=0, keepdims=True),
                (A, EL),
            ) != 0
            success = success | succ_c

        # ---------- action resource consumption ----------
        if any_action_consumed:
            succ_i = success.astype(i32)
            d = [jnp.zeros((A, EL), i32) for _ in range(R)]
            changed = False
            for r in range(R):
                col = S["action_consumed"][:, r]
                if col.any():
                    d[r] = -lut1(col, act, NACT) * succ_i
                    changed = True
            if changed:
                clip_write(d)

        # ---------- outputs ----------
        outa_ref[0] = cur_r
        outa_ref[1] = cur_c
        outa_ref[2] = vibe
        outa_ref[3] = frozen
        outa_ref[4] = success.astype(i32)
        outa_ref[5] = jnp.where(success, act, 0)
        for r in range(R):
            outinv_ref[r] = inv[r]
        if track_gained:
            for r in range(R):
                outgl_ref[r] = gained[r]
                outgl_ref[R + r] = lost[r]
        else:
            outgl_ref[0] = jnp.zeros((A, EL), i32)
        outasm_ref[0] = asm_cd_dur
        outasm_ref[1] = asm_cd_end
        outasm_ref[2] = asm_uses
        outasm_ref[3] = asm_clipped
        outasm_ref[4] = asm_uproto
        for r in range(R):
            outchinv_ref[r] = chinv[r]

    return kernel


_KERNEL_CACHE = {}


def call_fused(tables, act, rank, r0, c0, vibe0, frozen0, pk, inv, step1,
               asmf, chf, chinv, EL: int = 128, interpret: bool = False):
    """Invoke the fused kernel. Operands env-last ([.., E]); E % EL == 0
    (or E < EL, in which case one block covers the whole batch)."""
    A = int(tables.num_agents)
    R = int(tables.num_resources)
    NA = int(tables.n_assembler_slots)
    NC = int(tables.n_chest_slots)
    E = act.shape[-1]
    if E < EL:
        EL = E
    assert E % EL == 0, (E, EL)
    ck = (id(tables._cfg) if getattr(tables, "_cfg", None) is not None
          else id(tables), EL, tables.track_gained)
    if ck not in _KERNEL_CACHE:
        _KERNEL_CACHE[ck] = build_fused_kernel(tables, EL)
    kernel = _KERNEL_CACHE[ck]
    NGL = 2 * R if tables.track_gained else 1

    bs2 = lambda n: pl.BlockSpec((n, EL), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    bs3 = lambda f, n: pl.BlockSpec((f, n, EL), lambda i: (0, 0, i),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((6, A, E), jnp.int32),
            jax.ShapeDtypeStruct((R, A, E), jnp.int32),
            jax.ShapeDtypeStruct((NGL, A, E), jnp.int32),
            jax.ShapeDtypeStruct((5, NA, E), jnp.int32),
            jax.ShapeDtypeStruct((R, NC, E), jnp.int32),
        ),
        grid=(E // EL,),
        in_specs=[
            bs2(A), bs2(A), bs2(A), bs2(A), bs2(A), bs2(A), bs2(A),
            bs3(R, A), bs2(1), bs3(7, NA), bs3(2, NC), bs3(R, NC),
        ],
        out_specs=(
            bs3(6, A), bs3(R, A), bs3(NGL, A), bs3(5, NA), bs3(R, NC),
        ),
        interpret=interpret,
    )(act, rank, r0, c0, vibe0, frozen0, pk, inv, step1, asmf, chf, chinv)


@exact_matmuls
def fused_step_full(state, actions, tables, EL: int = 128,
                    interpret: bool = False):
    """Full batched step via the fused kernel; mirrors
    ``vmap(step_env_batched)(state, actions, tables, render="defer")``
    byte-for-byte. Returns (state', rew_at_obs [E, A])."""
    from metta_tpu.engine.clipper import clipper_step
    from metta_tpu.engine.rewards import (
        apply_damage, apply_regen, compute_stat_rewards,
    )
    from metta_tpu.engine.step_batched import _read_cells

    A = tables.num_agents
    R = tables.num_resources
    H, W = tables.height, tables.width

    orig_frozen = state.agent_frozen
    keys = jax.vmap(lambda k: jax.random.split(k, 4))(state.key)
    key, k_perm, k_damage, k_clip = (keys[:, i] for i in range(4))
    state = state.replace(
        key=key, step=state.step + 1, reward=jnp.zeros_like(state.reward)
    )
    perm = jax.vmap(lambda k: jax.random.permutation(k, A))(k_perm)
    rank = jnp.argsort(perm, axis=1).astype(jnp.int32)

    # minimal decode for the packed grid read (identical to the kernel's)
    act_c = jnp.clip(actions, 0, tables.n_actions - 1)
    arg = tables.action_arg[act_c]
    delta = tables.move_deltas[jnp.clip(arg, 0, 7)]
    rs = jnp.clip(state.agent_r + delta[..., 0], 0, H - 1)
    cs = jnp.clip(state.agent_c + delta[..., 1], 0, W - 1)
    packed = state.static_kind.astype(jnp.int32) * 65536 + state.static_idx
    pk = jax.vmap(_read_cells)(packed, rs, cs)

    T2 = lambda x: jnp.transpose(x, (1, 0))
    asmf = jnp.stack([
        state.asm_type, state.asm_uses, state.asm_cooldown_end,
        state.asm_cooldown_duration, state.asm_clipped.astype(jnp.int32),
        state.asm_unclip_proto, state.asm_valid.astype(jnp.int32),
    ], axis=0).transpose(0, 2, 1)                        # [7, NA, E]
    chf = jnp.stack([
        state.chest_type, state.chest_valid.astype(jnp.int32),
    ], axis=0).transpose(0, 2, 1)                        # [2, NC, E]

    outa, outinv, outgl, outasm, outchinv = call_fused(
        tables,
        T2(actions.astype(jnp.int32)), T2(rank),
        T2(state.agent_r), T2(state.agent_c),
        T2(state.agent_vibe), T2(state.agent_frozen), T2(pk),
        state.agent_inv.transpose(2, 1, 0),
        state.step[None, :].astype(jnp.int32),
        asmf, chf, state.chest_inv.transpose(2, 1, 0),
        EL=EL, interpret=interpret,
    )

    TB = T2
    success = TB(outa[4]) != 0
    state = state.replace(
        agent_r=TB(outa[0]), agent_c=TB(outa[1]), agent_vibe=TB(outa[2]),
        agent_frozen=TB(outa[3]),
        agent_inv=outinv.transpose(2, 1, 0),
        asm_cooldown_duration=TB(outasm[0]), asm_cooldown_end=TB(outasm[1]),
        asm_uses=TB(outasm[2]), asm_clipped=TB(outasm[3]) != 0,
        asm_unclip_proto=TB(outasm[4]),
        chest_inv=outchinv.transpose(2, 1, 0),
    )
    if tables.track_gained:
        state = state.replace(
            agent_gained=state.agent_gained + outgl[:R].transpose(2, 1, 0),
            agent_lost=state.agent_lost + outgl[R:].transpose(2, 1, 0),
        )

    # ---------- motion stats (step_batched.py:422-441) ----------
    act_ok = (actions >= 0) & (actions < tables.n_actions)
    ran = act_ok & ~(orig_frozen != 0)
    moved_any = (state.agent_r != state.agent_prev_r) | (
        state.agent_c != state.agent_prev_c
    )
    swm = jnp.where(moved_any, 0, state.agent_steps_without_motion + 1)
    state = state.replace(
        agent_steps_without_motion=jnp.where(
            ran, swm, state.agent_steps_without_motion
        ),
        agent_prev_r=jnp.where(ran, state.agent_r, state.agent_prev_r),
        agent_prev_c=jnp.where(ran, state.agent_c, state.agent_prev_c),
        action_success=success,
        executed_action=TB(outa[5]),
    )

    # ---------- world systems, grid rebuild, rewards ----------
    if tables.has_regen:
        state = jax.vmap(lambda s: apply_regen(s, tables))(state)
    if tables.has_damage:
        state = jax.vmap(lambda s, k: apply_damage(s, tables, k))(state, k_damage)
    if tables.has_aoe:
        from metta_tpu.engine.activation_wiring import apply_aoe

        state = jax.vmap(lambda s: apply_aoe(s, tables))(state)
    if tables.clipper_enabled and tables.clip_period > 0:
        state = jax.vmap(lambda s, k: clipper_step(s, tables, k))(state, k_clip)

    roh = (state.agent_r[..., None] == jnp.arange(H)[None, None, :]).astype(
        jnp.float32
    )
    coh = (state.agent_c[..., None] == jnp.arange(W)[None, None, :]).astype(
        jnp.float32
    )
    ids = (jnp.arange(A) + 1).astype(jnp.float32)
    grid = jnp.einsum(
        "eah,eaw->ehw", roh * ids[None, :, None], coh,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(state.agent_grid.dtype)
    state = state.replace(agent_grid=grid)

    rew_at_obs = state.reward
    state = jax.vmap(lambda s: compute_stat_rewards(s, tables))(state)
    state = state.replace(episode_reward=state.episode_reward + state.reward)

    if tables.max_steps > 0:
        ended = state.step >= tables.max_steps
        if tables.episode_truncates:
            state = state.replace(truncated=ended)
        else:
            state = state.replace(done=ended)
    return state, rew_at_obs
