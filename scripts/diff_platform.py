"""Bisect CPU-vs-TPU divergence in the batched env step.

Runs the exact trainer env path (MultiTaskEnv or single-task batched step)
with a deterministic random-action stream and dumps a per-step fingerprint
of every env-state field to a .npz. Run once per platform, then compare:

  python scripts/diff_platform.py --platform cpu --out /tmp/fp_cpu.npz
  python scripts/diff_platform.py --platform tpu --out /tmp/fp_tpu.npz
  python scripts/diff_platform.py --compare /tmp/fp_cpu.npz /tmp/fp_tpu.npz

JAX's threefry PRNG is platform-invariant, so the two runs execute the same
actions on the same maps; the first step where a field's fingerprint differs
localizes the divergent subsystem.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def run(args):
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from recipes.arena_basic_easy_shaped import mettagrid
    from metta_tpu.engine.env import MettaGridEnv

    env = MettaGridEnv(mettagrid(), num_envs=args.num_envs,
                       desync_episodes=False, track_stats=True,
                       step_mode="batched")
    A = env.num_agents
    n_actions = env.tables.n_actions
    key = jax.random.PRNGKey(0)
    vstate, obs = jax.jit(env.reset_fn)(key)
    if args.state_in:
        leaves, treedef = jax.tree_util.tree_flatten((vstate, obs))
        z = np.load(args.state_in)
        loaded = [jnp.asarray(z[f"l{i}"]) for i in range(len(leaves))]
        vstate, obs = jax.tree_util.tree_unflatten(treedef, loaded)
        print("loaded initial state from", args.state_in)
    if args.state_out:
        leaves = jax.tree_util.tree_leaves((vstate, obs))
        np.savez(args.state_out,
                 **{f"l{i}": np.asarray(jax.device_get(v))
                    for i, v in enumerate(leaves)})
        print("saved initial state to", args.state_out)

    def body(carry, k):
        vstate, obs = carry
        actions = jax.random.randint(k, (args.num_envs, A), 0, n_actions,
                                     dtype=jnp.int32)
        vstate, obs, rew, done, trunc = env.step_core(vstate, actions)
        return (vstate, obs), None

    chunk = args.chunk

    @jax.jit
    def run_chunk(vstate, obs, keys):
        (vstate, obs), _ = jax.lax.scan(body, (vstate, obs), keys)
        return vstate, obs

    fields = {}
    names = [f for f in vstate.env.__dataclass_fields__] if hasattr(
        vstate.env, "__dataclass_fields__") else list(
        type(vstate.env)._fields)

    def fp(vstate, obs):
        env_s = vstate.env
        out = {}
        for n in names:
            v = getattr(env_s, n)
            if v is None or not hasattr(v, "dtype"):
                continue
            x = np.asarray(jax.device_get(v))
            out[n] = np.float64(x.astype(np.float64).sum()) if x.dtype != np.bool_ \
                else np.float64(x.sum())
        out["__obs"] = np.float64(
            np.asarray(jax.device_get(obs)).astype(np.float64).sum())
        return out

    keys = jax.random.split(jax.random.PRNGKey(1), args.steps)
    rows = []
    for i in range(0, args.steps, chunk):
        vstate, obs = run_chunk(vstate, obs, keys[i:i + chunk])
        rows.append(fp(vstate, obs))
        print(f"step {i + chunk}", flush=True)
    all_names = sorted(rows[0])
    mat = np.array([[r[n] for n in all_names] for r in rows])
    np.savez(args.out, names=np.array(all_names), mat=mat, chunk=chunk)
    print("saved", args.out)


def compare(a_path, b_path):
    import numpy as np

    a, b = np.load(a_path, allow_pickle=True), np.load(b_path, allow_pickle=True)
    names = list(a["names"])
    assert names == list(b["names"])
    ma, mb = a["mat"], b["mat"]
    chunk = int(a["chunk"])
    n = min(ma.shape[0], mb.shape[0])
    first_bad = None
    for i in range(n):
        bad = [names[j] for j in range(len(names))
               if not np.isclose(ma[i, j], mb[i, j], rtol=1e-9, atol=1e-6)]
        if bad and first_bad is None:
            first_bad = i
            print(f"FIRST DIVERGENCE at step <= {(i + 1) * chunk}:")
        if bad:
            print(f"  step {(i + 1) * chunk}: {len(bad)} fields differ: "
                  f"{bad[:12]}")
            for j in (j for j in range(len(names)) if names[j] in bad[:6]):
                print(f"    {names[j]}: cpu={ma[i, j]:.6g} other={mb[i, j]:.6g}")
        if first_bad is not None and i > first_bad + 3:
            break
    if first_bad is None:
        print(f"IDENTICAL over {n * chunk} steps")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=1)
    ap.add_argument("--num-envs", type=int, default=8)
    ap.add_argument("--out", type=str, default="/tmp/fp.npz")
    ap.add_argument("--state-in", type=str, default=None)
    ap.add_argument("--state-out", type=str, default=None)
    ap.add_argument("--compare", nargs=2, default=None)
    args = ap.parse_args()
    if args.compare:
        compare(*args.compare)
    else:
        run(args)
