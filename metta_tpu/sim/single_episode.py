"""Pure single-episode job runner.

Parity: reference ``proto/metta/protobuf/sim/single_episode.proto`` +
``metta/sim/simulate_and_record.py`` — run exactly one episode with an
explicit per-agent policy assignment, no network side effects; results and
replay go to ``file://`` URIs named in the job.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from metta_tpu.config.mettagrid_config import MettaGridConfig
from metta_tpu.policy.policy import MultiAgentPolicy
from metta_tpu.protobuf.sim_gen import single_episode_pb2 as pb


def _file_uri_path(uri: str) -> str:
    if uri.startswith("file://"):
        return uri[len("file://"):]
    return uri


def load_policy_for_env(uri: str, env, n_slots: int) -> MultiAgentPolicy:
    from metta_tpu.policy.policy import NetworkPolicy, NoopPolicy, RandomPolicy

    if uri == "noop://":
        return NoopPolicy()
    if uri.startswith("random://"):
        return RandomPolicy(len(env.action_names))
    return NetworkPolicy.from_bundle(uri, env, n_slots)


def run_single_episode_job(job: pb.PureSingleEpisodeJob) -> dict:
    """Execute one episode; returns (and optionally writes) the result dict:
    per-agent rewards, assignments, episode length."""
    from metta_tpu.engine.env import MettaGridEnv

    env_dict = _struct_to_dict(job.env_raw)
    env_cfg = MettaGridConfig.model_validate(env_dict)
    env_cfg.desync_episodes = False
    env = MettaGridEnv(env_cfg, num_envs=1, desync_episodes=False)
    A = env.num_agents

    assignments = list(job.assignments) or [0] * A
    if len(assignments) != A:
        raise ValueError(f"assignments has {len(assignments)} entries for {A} agents")
    policies: List[MultiAgentPolicy] = [
        load_policy_for_env(u, env, A) for u in job.policy_uris
    ] or [load_policy_for_env("noop://", env, A)]
    for p in policies:
        p.reset(A)

    seed = int.from_bytes(job.seed[:8], "little") if job.seed else 0
    max_steps = env.compiled.max_steps or 1000

    replay = None
    writer = None
    if job.replay_uri:
        from metta_tpu.sim.replay_writer import ReplayLogWriter

        rp = _file_uri_path(job.replay_uri)
        writer = ReplayLogWriter(os.path.dirname(rp) or ".")
        replay = writer.new_episode(env, env_cfg)

    obs = env.reset(seed=seed)
    assign = np.asarray(assignments)
    rewards = np.zeros((A,), np.float64)
    steps = 0
    for step in range(max_steps):
        obs_flat = obs.reshape(A, *obs.shape[2:])
        actions = np.zeros((A,), np.int32)
        for p_idx, policy in enumerate(policies):
            acts = policy.step_batch(obs_flat)
            mask = assign == p_idx
            actions[mask] = acts[mask]
        obs, rew, done, trunc = env.step_no_reset(actions[None, :])
        rewards += rew[0]
        steps += 1
        if replay is not None:
            replay.log_step(env.state.env, actions, env.action_success(0),
                            rew[0], e=0)
        if bool(done[0] or trunc[0]):
            break

    if replay is not None:
        replay.write_replay(_file_uri_path(job.replay_uri))

    result = {
        "episode_length": steps,
        "assignments": assignments,
        "policy_uris": list(job.policy_uris),
        "agent_rewards": rewards.tolist(),
        "total_reward": float(rewards.sum()),
        "rewards_by_policy": [
            float(rewards[assign == i].mean()) if (assign == i).any() else 0.0
            for i in range(max(len(policies), 1))
        ],
    }
    if job.results_uri:
        path = _file_uri_path(job.results_uri)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(result, f)
    return result


def _struct_to_dict(struct) -> dict:
    from google.protobuf import json_format

    return json_format.MessageToDict(struct)


def job_from_config(env_cfg: MettaGridConfig, policy_uris: List[str],
                    assignments: Optional[List[int]] = None,
                    results_uri: str = "", replay_uri: str = "",
                    seed: int = 0) -> pb.PureSingleEpisodeJob:
    """Convenience constructor packing a pydantic env config into the job."""
    from google.protobuf import json_format

    job = pb.PureSingleEpisodeJob(
        policy_uris=policy_uris,
        assignments=assignments or [],
        results_uri=results_uri,
        replay_uri=replay_uri,
        seed=seed.to_bytes(8, "little"),
    )
    json_format.ParseDict(json.loads(env_cfg.model_dump_json()), job.env_raw)
    return job
