"""gRPC policy serving + single-episode jobs + remote eval queue
(reference: metta/sim/serve_policy.py, proto/.../single_episode.proto,
metta/sim/remote.py + app_backend eval worker)."""

import json
import os
import zlib

import numpy as np
import pytest

from metta_tpu.builder.envs import make_navigation
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.policy.policy import RandomPolicy
from metta_tpu.protobuf.sim_gen import policy_v1_pb2 as pb
from metta_tpu.sim.remote import EvalTaskQueue, evaluate_remotely, run_eval_worker
from metta_tpu.sim.runner import SimulationConfig
from metta_tpu.sim.serve_policy import (
    PolicyClient,
    create_server,
    game_rules_from_env,
)
from metta_tpu.sim.single_episode import job_from_config, run_single_episode_job


@pytest.fixture(scope="module")
def nav_cfg():
    cfg = make_navigation(num_agents=1)
    cfg.game.max_steps = 16
    return cfg


def test_serve_policy_roundtrip(nav_cfg):
    env = MettaGridEnv(nav_cfg, num_envs=1)
    n_act = len(env.action_names)
    server, port = create_server(RandomPolicy(n_act, seed=3))
    try:
        client = PolicyClient(f"127.0.0.1:{port}")
        rules = game_rules_from_env(env)
        assert len(rules.actions) == n_act
        client.prepare("ep1", agent_ids=[0], game_rules=rules)

        obs = env.reset(seed=0)
        for step in range(5):
            acts = client.batch_step("ep1", step, {0: obs[0, 0]})
            assert 0 <= acts[0] < n_act
            obs, rew, done, trunc = env.step(np.array([[acts[0]]], np.int32))
        client.close()
    finally:
        server.stop(0)


def test_serve_policy_unknown_episode(nav_cfg):
    import grpc

    env = MettaGridEnv(nav_cfg, num_envs=1)
    server, port = create_server(RandomPolicy(len(env.action_names)))
    try:
        client = PolicyClient(f"127.0.0.1:{port}")
        with pytest.raises(grpc.RpcError) as ei:
            client.batch_step("nope", 0, {0: np.zeros((4, 3), np.uint8)})
        assert ei.value.code() == grpc.StatusCode.NOT_FOUND
        client.close()
    finally:
        server.stop(0)


def test_single_episode_job(nav_cfg, tmp_path):
    results_uri = f"file://{tmp_path}/result.json"
    replay_uri = f"file://{tmp_path}/replay.json.z"
    job = job_from_config(
        nav_cfg, policy_uris=["random://"], results_uri=results_uri,
        replay_uri=replay_uri, seed=7,
    )
    # proto roundtrip (what a remote runner would receive)
    job = type(job).FromString(job.SerializeToString())
    result = run_single_episode_job(job)
    assert result["episode_length"] > 0
    assert len(result["agent_rewards"]) == 1
    with open(tmp_path / "result.json") as f:
        assert json.load(f)["episode_length"] == result["episode_length"]
    blob = (tmp_path / "replay.json.z").read_bytes()
    replay = json.loads(zlib.decompress(blob))
    assert replay["version"] == 3 and replay["objects"]


def test_remote_eval_queue(nav_cfg, tmp_path):
    queue = EvalTaskQueue(str(tmp_path / "queue"))
    sims = [SimulationConfig(suite="s", name="nav", env=nav_cfg, episodes=2)]
    task = evaluate_remotely(sims, queue, policy_uri="random://")
    assert queue.get(task.task_id).status == "unprocessed"

    processed = run_eval_worker(queue, max_tasks=1, idle_timeout=1.0)
    assert processed == 1
    done = queue.wait(task.task_id, timeout=5.0)
    assert done.status == "done"
    assert "s/nav" in done.result
    assert np.isfinite(done.result["s/nav"]["mean_reward"])


def test_queue_claim_is_exclusive(tmp_path):
    queue = EvalTaskQueue(str(tmp_path / "q2"))
    from metta_tpu.sim.remote import EvalTask

    queue.submit(EvalTask(task_id="t1", command="", policy_uri="",
                          simulations=[]))
    a = queue.claim("w1")
    b = queue.claim("w2")
    assert a is not None and a.task_id == "t1"
    assert b is None
