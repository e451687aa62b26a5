"""gRPC policy server.

Parity: reference ``metta/sim/serve_policy.py`` + the
``metta.protobuf.sim.policy_v1`` protocol (PreparePolicy / BatchStep) — here
as an actual gRPC service (the reference serves the same protos over
FastAPI+JSON and leaves BatchStep observation decoding as a TODO; this
implementation decodes TRIPLET_V1 observations and steps real policies).

Service registration uses ``grpc.method_handlers_generic_handler`` directly
(no grpc_tools stub generation needed). Regenerate message bindings with
``scripts/gen_protos.sh``.
"""

from __future__ import annotations

import logging
from concurrent import futures
from typing import Dict, List, Optional

import numpy as np

from metta_tpu.policy.policy import AgentPolicy, MultiAgentPolicy
from metta_tpu.protobuf.sim_gen import policy_v1_pb2 as pb

logger = logging.getLogger(__name__)

SERVICE_NAME = "metta_tpu.protobuf.sim.policy_v1.Policy"


class EpisodeNotFoundError(KeyError):
    pass


class AgentNotFoundError(KeyError):
    pass


class _Episode:
    def __init__(self, episode_id: str, policy: MultiAgentPolicy,
                 agent_ids: List[int]):
        self.episode_id = episode_id
        self.agent_policies: Dict[int, AgentPolicy] = {
            a: policy.agent_policy(a) for a in agent_ids
        }


class PolicyService:
    """Episode-scoped policy serving (serve_policy.py:44-78)."""

    def __init__(self, policy: MultiAgentPolicy):
        self.policy = policy
        self._episodes: Dict[str, _Episode] = {}

    def prepare_policy(self, req: pb.PreparePolicyRequest) -> pb.PreparePolicyResponse:
        self.policy.reset(max(list(req.agent_ids) or [0]) + 1)
        self._episodes[req.episode_id] = _Episode(
            req.episode_id, self.policy, list(req.agent_ids)
        )
        return pb.PreparePolicyResponse()

    def batch_step(self, req: pb.BatchStepRequest) -> pb.BatchStepResponse:
        episode = self._episodes.get(req.episode_id)
        if episode is None:
            raise EpisodeNotFoundError(req.episode_id)
        resp = pb.BatchStepResponse()
        for agent_obs in req.agent_observations:
            ap = episode.agent_policies.get(agent_obs.agent_id)
            if ap is None:
                raise AgentNotFoundError(agent_obs.agent_id)
            # TRIPLET_V1: flat (loc, feature, value) uint8 triplets
            obs = np.frombuffer(agent_obs.observations, np.uint8).reshape(-1, 3)
            action = int(ap.step(obs))
            resp.agent_actions.append(
                pb.AgentActions(agent_id=agent_obs.agent_id, action_id=[action])
            )
        return resp


def _handlers(service: PolicyService):
    import grpc

    def wrap(fn):
        def handler(request, context):
            try:
                return fn(request)
            except (EpisodeNotFoundError, AgentNotFoundError) as e:
                context.abort(grpc.StatusCode.NOT_FOUND, str(e))

        return handler

    return grpc.method_handlers_generic_handler(SERVICE_NAME, {
        "PreparePolicy": grpc.unary_unary_rpc_method_handler(
            wrap(service.prepare_policy),
            request_deserializer=pb.PreparePolicyRequest.FromString,
            response_serializer=pb.PreparePolicyResponse.SerializeToString,
        ),
        "BatchStep": grpc.unary_unary_rpc_method_handler(
            wrap(service.batch_step),
            request_deserializer=pb.BatchStepRequest.FromString,
            response_serializer=pb.BatchStepResponse.SerializeToString,
        ),
    })


def create_server(policy: MultiAgentPolicy, port: int = 0,
                  max_workers: int = 4):
    """Start a gRPC server for the policy; returns (server, bound_port)."""
    import grpc

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    server.add_generic_rpc_handlers((_handlers(PolicyService(policy)),))
    bound = server.add_insecure_port(f"127.0.0.1:{port}")
    server.start()
    logger.info("policy server on port %d", bound)
    return server, bound


class PolicyClient:
    """Thin client for the Policy service (used by remote-episode runners)."""

    def __init__(self, target: str):
        import grpc

        self._channel = grpc.insecure_channel(target)
        self._prepare = self._channel.unary_unary(
            f"/{SERVICE_NAME}/PreparePolicy",
            request_serializer=pb.PreparePolicyRequest.SerializeToString,
            response_deserializer=pb.PreparePolicyResponse.FromString,
        )
        self._step = self._channel.unary_unary(
            f"/{SERVICE_NAME}/BatchStep",
            request_serializer=pb.BatchStepRequest.SerializeToString,
            response_deserializer=pb.BatchStepResponse.FromString,
        )

    def prepare(self, episode_id: str, agent_ids: List[int],
                game_rules: Optional[pb.GameRules] = None) -> None:
        req = pb.PreparePolicyRequest(
            episode_id=episode_id, agent_ids=agent_ids,
            observations_format=pb.AgentObservations.TRIPLET_V1,
        )
        if game_rules is not None:
            req.game_rules.CopyFrom(game_rules)
        self._prepare(req)

    def batch_step(self, episode_id: str, step_id: int,
                   obs_by_agent: Dict[int, np.ndarray]) -> Dict[int, int]:
        req = pb.BatchStepRequest(episode_id=episode_id, step_id=step_id)
        for agent_id, obs in obs_by_agent.items():
            req.agent_observations.append(pb.AgentObservations(
                agent_id=agent_id,
                observations=np.ascontiguousarray(obs, np.uint8).tobytes(),
            ))
        resp = self._step(req)
        return {a.agent_id: int(a.action_id[0]) for a in resp.agent_actions}

    def close(self):
        self._channel.close()


def game_rules_from_env(env) -> pb.GameRules:
    """Build the GameRules message from a compiled env (feature-id table +
    action list — the trained-policy compatibility contract)."""
    rules = pb.GameRules()
    feat = env.tables.feat_id
    norm = getattr(env.compiled, "feat_norm", None)
    for name, fid in sorted(feat.items(), key=lambda kv: kv[1]):
        f = rules.features.add()
        f.id = int(fid)
        f.name = str(name)
        if norm is not None:
            try:
                f.normalization = float(norm[int(fid)])
            except Exception:
                pass
    for i, name in enumerate(env.action_names):
        a = rules.actions.add()
        a.id = i
        a.name = str(name)
    return rules
