"""On-device PPO actor-learner.

The TPU-native replacement for the reference trainer stack
(``metta/rl/trainer.py`` + ``training/core.py`` + ``training/experience.py``):
instead of env worker processes feeding a GPU learner through shared memory,
the rollout is a ``lax.scan`` over ``bptt_horizon`` steps alternating
``policy.apply`` and the vectorized env step, writing the trajectory directly
into HBM; the advantage pass and minibatched PPO updates run in the same jitted
program. One call to ``update`` = one full train batch (rollout → advantage →
update_epochs × minibatches) with zero host↔device traffic.

Loss parity: ``loss/ppo_actor.py`` (clipped PG + entropy, clamp(-10,10) on the
log-ratio), ``loss/ppo_critic.py`` (clipped value MSE, or the default GTD(λ)
update with the h-value aux head), reward centering
(``trainer_config.py:36-40``), vtrace advantages (``advantage.py:77-121``).
Recurrent state: persistent during rollout (reset on episode end), zero per
BPTT segment in the learner (``policies/vit.py:38``
``pass_state_during_training=False``).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from metta_tpu.config.mettagrid_config import MettaGridConfig
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.models.vit import ViTConfig
from metta_tpu.rl.advantage import compute_delta_lambda, normalize_advantage, puff_advantage
from metta_tpu.rl.config import TrainerConfig


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    key: jnp.ndarray
    vstate: Any                 # VecEnvState
    obs: jnp.ndarray            # [E, A, T_tok, 3] uint8 (current)
    core: Any                   # recurrent state, [B, ...]
    prev_reward: jnp.ndarray    # [B] f32 — reward received with current obs
    prev_done: jnp.ndarray      # [B] f32 — done flag of current obs
    r_bar: jnp.ndarray          # [] f32 reward-centering EMA
    update_idx: jnp.ndarray     # [] int32


@struct.dataclass
class Trajectory:
    obs: jnp.ndarray        # [T, B, K, 3] uint8
    actions: jnp.ndarray    # [T, B] int32
    logprob: jnp.ndarray    # [T, B] f32
    value: jnp.ndarray      # [T, B] f32
    reward: jnp.ndarray     # [T, B] f32 (received on arriving at obs_t)
    done: jnp.ndarray       # [T, B] f32 (obs_t begins a new episode)


def make_optimizer(cfg: TrainerConfig):
    oc = cfg.optimizer
    if oc.type == "adamw_schedulefree" and hasattr(optax.contrib, "schedule_free_adamw"):
        base = optax.contrib.schedule_free_adamw(
            learning_rate=oc.learning_rate, b1=oc.beta1, b2=oc.beta2,
            eps=oc.eps, weight_decay=oc.weight_decay, warmup_steps=oc.warmup_steps,
        )
    elif oc.type in ("adamw", "adamw_schedulefree"):
        base = optax.adamw(oc.learning_rate, b1=oc.beta1, b2=oc.beta2,
                           eps=oc.eps, weight_decay=oc.weight_decay)
    elif oc.type == "adam":
        base = optax.adam(oc.learning_rate, b1=oc.beta1, b2=oc.beta2, eps=oc.eps)
    else:
        base = optax.sgd(oc.learning_rate)
    return optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), base)


class Trainer:
    """Single-host trainer; see metta_tpu.parallel for the multi-chip version."""

    def __init__(
        self,
        env_cfg: MettaGridConfig,
        trainer_cfg: Optional[TrainerConfig] = None,
        policy_cfg: Optional[ViTConfig] = None,
        num_envs: Optional[int] = None,
    ):
        self.cfg = trainer_cfg or TrainerConfig()
        cfg = self.cfg
        A = env_cfg.game.num_agents
        T = cfg.bptt_horizon
        if num_envs is None:
            num_envs = cfg.num_envs or max(cfg.batch_size // (T * A), 1)
        # training env: stat accumulators off unless a reward reads them
        self.env = MettaGridEnv(env_cfg, num_envs=num_envs, track_stats=False,
                                step_mode=cfg.env_step_mode)
        self.E = num_envs
        self.A = A
        self.B = num_envs * A
        self.T = T
        self.rows_per_mb = max(cfg.minibatch_size // T, 1)
        if self.B % self.rows_per_mb != 0:
            # shrink to a divisor
            while self.B % self.rows_per_mb != 0:
                self.rows_per_mb -= 1
        self.n_minibatches = self.B // self.rows_per_mb

        pcfg = policy_cfg or ViTConfig()
        self.policy_cfg = pcfg
        self.policy = pcfg.make(
            n_actions=self.env.compiled.n_actions,
            feature_norms=self.env.compiled.feature_normalizations,
        )
        self.tx = make_optimizer(cfg)
        self.teacher = None  # (policy, params) for kickstarter distillation
        if cfg.losses.kickstarter.enabled and cfg.losses.kickstarter.teacher_uri:
            self._load_teacher(cfg.losses.kickstarter.teacher_uri)
        self._update_jit = jax.jit(self._update, donate_argnums=(0,))
        self.agent_steps = 0

    def _load_teacher(self, uri: str):
        from metta_tpu.rl.checkpoint import load_policy_bundle, resolve_uri

        params, policy_cfg, _ = load_policy_bundle(resolve_uri(uri))
        teacher = policy_cfg.make(
            self.env.compiled.n_actions, self.env.compiled.feature_normalizations
        )
        import jax.numpy as _jnp

        obs0 = _jnp.zeros((1, policy_cfg.max_tokens, 3), _jnp.uint8)
        like = teacher.init(jax.random.PRNGKey(0), obs0, teacher.initial_state(1))
        params, _, _ = load_policy_bundle(resolve_uri(uri), params_like=like)
        self.set_teacher(teacher, params)

    def set_teacher(self, policy, params):
        self.teacher = (policy, params)
        self._update_jit = jax.jit(self._update, donate_argnums=(0,))

    # ------------------------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        key = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        key, k_env, k_par = jax.random.split(key, 3)
        vstate, obs = self.env.reset_fn(k_env)
        obs_flat = obs.reshape(self.B, *obs.shape[2:])
        core = self.policy.initial_state(self.B)
        params = self.policy.init(k_par, obs_flat[: self.B], core)
        opt_state = self.tx.init(params)
        return TrainState(
            params=params, opt_state=opt_state, key=key, vstate=vstate,
            obs=obs, core=core,
            prev_reward=jnp.zeros((self.B,), jnp.float32),
            prev_done=jnp.zeros((self.B,), jnp.float32),
            r_bar=jnp.float32(self.cfg.advantage.reward_centering.initial_reward_mean),
            update_idx=jnp.int32(0),
        )

    # ------------------------------------------------------------------

    def _policy_step(self, params, obs_flat, core):
        return self.policy.apply(params, obs_flat, core)

    def _rollout(self, ts: TrainState):
        E, A, B, K = self.E, self.A, self.B, self.policy_cfg.max_tokens

        def step_fn(carry, _):
            key, vstate, obs, core, prev_rew, prev_done = carry
            obs_flat = obs.reshape(B, obs.shape[2], 3)
            logits, value, _hv, core2 = self._policy_step(ts.params, obs_flat, core)
            key, k_act = jax.random.split(key)
            action = jax.random.categorical(k_act, logits)
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(logits), action[:, None], axis=1
            )[:, 0]
            vstate2, obs2, rew, done, trunc = self.env.step_core(
                vstate, action.reshape(E, A).astype(jnp.int32)
            )
            ended = (done | trunc).astype(jnp.float32)           # [E]
            dn = jnp.repeat(ended, A)                            # [B]
            core3 = jax.tree.map(
                lambda z: jnp.where(dn.reshape((B,) + (1,) * (z.ndim - 1)) > 0,
                                    jnp.zeros_like(z), z),
                core2,
            )
            out = Trajectory(
                obs=obs_flat[:, :K],
                actions=action.astype(jnp.int32),
                logprob=logp,
                value=value,
                reward=prev_rew,
                done=prev_done,
            )
            return (key, vstate2, obs2, core3, rew.reshape(-1), dn), out

        carry0 = (ts.key, ts.vstate, ts.obs, ts.core, ts.prev_reward, ts.prev_done)
        (key, vstate, obs, core, prev_rew, prev_done), traj = jax.lax.scan(
            step_fn, carry0, None, length=self.T
        )
        ts = ts.replace(key=key, vstate=vstate, obs=obs, core=core,
                        prev_reward=prev_rew, prev_done=prev_done)
        return ts, traj

    # ------------------------------------------------------------------

    def _sequence_forward(self, params, obs_seq, rows):
        """Forward a [T, M, K, 3] obs sequence with zero initial state."""
        core0 = self.policy.initial_state(rows)

        def step(core, obs_t):
            logits, value, h_value, core = self.policy.apply(params, obs_t, core)
            return core, (logits, value, h_value)

        step = jax.checkpoint(step)
        _, (logits, value, h_value) = jax.lax.scan(step, core0, obs_seq)
        return logits, value, h_value  # [T, M, ...]

    def _loss_fn(self, params, mb, hp, axis_name=None):
        """PPO actor + critic loss on one minibatch dict of [T, M] arrays.

        ``hp`` is the runtime scheduled-coefficient vector (rl/scheduler.py
        HP_FIELDS order) so schedules never trigger recompiles.
        """
        from metta_tpu.rl.scheduler import HP_INDEX

        cfg = self.cfg
        ac = cfg.losses.ppo_actor
        cc = cfg.losses.ppo_critic
        adv_cfg = cfg.advantage
        clip_coef = hp[HP_INDEX["ppo_clip_coef"]]
        ent_coef = hp[HP_INDEX["ppo_ent_coef"]]
        vf_coef = hp[HP_INDEX["vf_coef"]]

        logits, value, h_value = self._sequence_forward(
            params, mb["obs"], mb["obs"].shape[1]
        )
        logp_all = jax.nn.log_softmax(logits)                    # [T, M, n_act]
        new_logp = jnp.take_along_axis(logp_all, mb["actions"][..., None], axis=2)[..., 0]
        entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)

        logratio = jnp.clip(new_logp - mb["logprob"], -10.0, 10.0)
        ratio = jnp.exp(logratio)

        # [M, T] time-major → row-major for the scans
        v_bt = value.T
        rew_bt = mb["reward"].T
        done_bt = mb["done"].T

        if cc.critic_update == "gtd_lambda":
            dl = compute_delta_lambda(v_bt, rew_bt, done_bt,
                                      adv_cfg.gamma, adv_cfg.gae_lambda)  # [M, T]
            adv = dl.T                                            # actor uses δλ
            dl_t = dl[:, :-1]
            v_t = v_bt[:, :-1]
            h_bt = h_value.T[:, :-1]
            h_sg = jax.lax.stop_gradient(h_bt)
            dl_sg = jax.lax.stop_gradient(dl_t)
            critic_loss = jnp.mean(h_sg * dl_t) - jnp.mean((dl_sg - h_sg) * v_t)
            aux_params = params["params"]["gtd_aux"]
            leaves = jax.tree.leaves(aux_params)
            l2 = sum(jnp.sum(p * p) for p in leaves) / max(sum(p.size for p in leaves), 1)
            aux_loss = 0.5 * jnp.mean((dl_sg - h_bt) ** 2) + 0.5 * cc.beta * l2
            v_loss = vf_coef * critic_loss + cc.aux_coef * aux_loss
        else:
            adv = mb["advantages"]
            returns = mb["advantages"] + mb["value"]
            if cc.clip_vloss:
                v_unclipped = (value - returns) ** 2
                v_clipped_pred = mb["value"] + jnp.clip(
                    value - mb["value"], -cc.vf_clip_coef, cc.vf_clip_coef
                )
                v_clipped = (v_clipped_pred - returns) ** 2
                v_loss = 0.5 * jnp.mean(jnp.maximum(v_unclipped, v_clipped))
            else:
                v_loss = 0.5 * jnp.mean((value - returns) ** 2)
            v_loss = vf_coef * v_loss

        adv = jax.lax.stop_gradient(adv)
        if ac.norm_adv:
            adv = normalize_advantage(adv, axis_name)
        pg1 = -adv * ratio
        pg2 = -adv * jnp.clip(ratio, 1 - clip_coef, 1 + clip_coef)
        pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
        ent_loss = jnp.mean(entropy)

        loss = pg_loss - ent_coef * ent_loss + v_loss

        # kickstarter distillation: KL(teacher ‖ student) (loss/kickstarter.py)
        ks = cfg.losses.kickstarter
        if self.teacher is not None and ks.enabled:
            t_policy, t_params = self.teacher
            Tn, M = mb["obs"].shape[:2]

            def t_step(core, obs_t):
                t_logits, t_v, _th, core = t_policy.apply(t_params, obs_t, core)
                return core, (t_logits, t_v)

            _, (t_logits, t_values) = jax.lax.scan(
                t_step, t_policy.initial_state(M), mb["obs"]
            )
            t_logp = jax.lax.stop_gradient(jax.nn.log_softmax(t_logits))
            ks_action = jnp.mean(
                jnp.sum(jnp.exp(t_logp) * (t_logp - logp_all), axis=-1)
            )
            ks_value = jnp.mean((jax.lax.stop_gradient(t_values) - value) ** 2)
            ks_coef = hp[HP_INDEX["kickstarter_coef"]]
            loss = loss + ks_coef * ks_action + ks.value_loss_coef * ks_value

        # behavior cloning on recorded teacher actions (loss/action_supervised.py)
        asup = cfg.losses.action_supervised
        if asup.enabled and "teacher_actions" in mb:
            ce = -jnp.take_along_axis(
                logp_all, mb["teacher_actions"][..., None], axis=2
            )[..., 0]
            loss = loss + hp[HP_INDEX["action_supervised_coef"]] * jnp.mean(ce)

        approx_kl = jnp.mean((ratio - 1) - logratio)
        clipfrac = jnp.mean((jnp.abs(ratio - 1.0) > ac.clip_coef).astype(jnp.float32))
        metrics = dict(
            policy_loss=pg_loss, value_loss=v_loss, entropy=ent_loss,
            approx_kl=approx_kl, clipfrac=clipfrac,
        )
        return loss, metrics

    # ------------------------------------------------------------------

    def default_hp(self):
        """Base scheduled-coefficient vector from the config."""
        from metta_tpu.rl.scheduler import HP_FIELDS

        ls = self.cfg.losses
        base = {
            "ppo_clip_coef": ls.ppo_actor.clip_coef,
            "ppo_ent_coef": ls.ppo_actor.ent_coef,
            "vf_coef": ls.ppo_critic.vf_coef,
            "kickstarter_coef": ls.kickstarter.action_loss_coef if ls.kickstarter.enabled else 0.0,
            "action_supervised_coef": ls.action_supervised.coef if ls.action_supervised.enabled else 0.0,
        }
        return [float(base[n]) for n in HP_FIELDS]

    def update(self, ts: TrainState, hp=None):
        """One train batch; hp overrides the scheduled coefficients."""
        if hp is None:
            hp = jnp.asarray(self.default_hp(), jnp.float32)
        else:
            hp = jnp.asarray(hp, jnp.float32)
        if self.cfg.rollout_chunks > 1:
            return self._update_chunked(ts, hp)
        return self._update_jit(ts, hp)

    # -- chunked path: several shorter device programs per update (see
    # TrainerConfig.rollout_chunks) --------------------------------------

    def _ensure_chunked_jits(self):
        if getattr(self, "_chunk_jits", None) is not None:
            return
        n_chunks = self.cfg.rollout_chunks
        assert self.T % n_chunks == 0, "bptt_horizon must divide rollout_chunks"
        Tc = self.T // n_chunks
        full_T = self.T

        def rollout_chunk(ts):
            saved_T = self.T
            self.T = Tc
            try:
                ts, traj = self._rollout(ts)
            finally:
                self.T = saved_T
            return ts, traj

        def learn(ts, traj, hp):
            return self._learn_phase(ts, traj, hp, axis_name=None)

        self._chunk_jits = (
            jax.jit(rollout_chunk, donate_argnums=(0,)),
            jax.jit(learn, donate_argnums=(1,)),
        )

    def _update_chunked(self, ts: TrainState, hp):
        self._ensure_chunked_jits()
        roll_jit, learn_jit = self._chunk_jits
        chunks = []
        for _ in range(self.cfg.rollout_chunks):
            ts, traj = roll_jit(ts)
            chunks.append(traj)
        traj = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)
        return learn_jit(ts, traj, hp)

    def _update(self, ts: TrainState, hp, axis_name=None):
        ts, traj = self._rollout(ts)
        return self._learn_phase(ts, traj, hp, axis_name)

    def _learn_phase(self, ts: TrainState, traj, hp, axis_name=None):
        cfg = self.cfg
        adv_cfg = cfg.advantage
        B = self.B
        T = traj.reward.shape[0]

        # reward centering EMA (trainer_config.py:36-40)
        rc = adv_cfg.reward_centering
        if rc.enabled:
            batch_mean = jnp.mean(traj.reward)
            if axis_name is not None:
                batch_mean = jax.lax.pmean(batch_mean, axis_name)
            r_bar = ts.r_bar + rc.beta * (batch_mean - ts.r_bar)
            rewards_c = traj.reward - r_bar
            ts = ts.replace(r_bar=r_bar)
        else:
            rewards_c = traj.reward

        # full-batch vtrace advantages, [B, T] layout
        adv_bt = puff_advantage(
            traj.value.T, rewards_c.T, traj.done.T,
            jnp.ones_like(traj.value.T),
            adv_cfg.gamma, adv_cfg.gae_lambda,
            adv_cfg.vtrace_rho_clip, adv_cfg.vtrace_c_clip,
        )
        advantages = adv_bt.T  # [T, B]

        data = dict(
            obs=traj.obs, actions=traj.actions, logprob=traj.logprob,
            value=traj.value, reward=rewards_c, done=traj.done,
            advantages=advantages,
        )

        rows_mb = self.rows_per_mb
        n_mb = self.n_minibatches

        def epoch_body(carry, _):
            params, opt_state, key, msum = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, B)

            def mb_body(i, c):
                params, opt_state, msum = c
                rows = jax.lax.dynamic_slice(perm, (i * rows_mb,), (rows_mb,))
                mb = {k: jnp.take(v, rows, axis=1) for k, v in data.items()}
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True
                )(params, mb, hp, axis_name)
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                    metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis_name), metrics)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                msum = jax.tree.map(jnp.add, msum, metrics)
                return params, opt_state, msum

            params, opt_state, msum = jax.lax.fori_loop(
                0, n_mb, mb_body, (params, opt_state, msum)
            )
            return (params, opt_state, key, msum), None

        m0 = dict(policy_loss=0.0, value_loss=0.0, entropy=0.0, approx_kl=0.0, clipfrac=0.0)
        m0 = jax.tree.map(jnp.float32, m0)
        (params, opt_state, key, msum), _ = jax.lax.scan(
            epoch_body, (ts.params, ts.opt_state, ts.key, m0), None,
            length=cfg.update_epochs,
        )
        n_updates = cfg.update_epochs * n_mb
        metrics = jax.tree.map(lambda m: m / n_updates, msum)
        metrics["reward_mean"] = jnp.mean(traj.reward)
        metrics["r_bar"] = ts.r_bar
        metrics["value_mean"] = jnp.mean(traj.value)
        ts = ts.replace(params=params, opt_state=opt_state, key=key,
                        update_idx=ts.update_idx + 1)
        return ts, metrics

    # ------------------------------------------------------------------

    def train(
        self,
        total_timesteps: Optional[int] = None,
        ts: Optional[TrainState] = None,
        log_fn: Optional[Callable] = None,
    ):
        total = total_timesteps or self.cfg.total_timesteps
        if ts is None:
            ts = self.init_state()
        steps_per_update = self.B * self.T
        t0 = time.time()
        from metta_tpu.rl.scheduler import LossScheduler, SchedulerConfig
        scheduler = LossScheduler(
            getattr(self.cfg, "scheduler", None) or SchedulerConfig(),
            dict(zip(["ppo_clip_coef", "ppo_ent_coef", "vf_coef",
                      "kickstarter_coef", "action_supervised_coef"], self.default_hp())),
        )
        n_update = 0
        while self.agent_steps < total:
            ts, metrics = self.update(ts, scheduler.hp_vector(n_update))
            n_update += 1
            self.agent_steps += steps_per_update
            if log_fn is not None:
                m = {k: float(v) for k, v in metrics.items()}
                m["agent_steps"] = self.agent_steps
                m["sps"] = self.agent_steps / max(time.time() - t0, 1e-9)
                log_fn(m)
        return ts
