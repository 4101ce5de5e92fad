"""Evaluation harness — the in-core counterpart of the separate
``pogema-toolbox`` package (SURVEY.md §1 "Ecosystem": YAML-driven eval,
algo/map registries, result aggregation).

Registers policies by name, runs them over grids of configs × seeds,
and aggregates the standard MAPF metrics (ISR/CSR/ep_length/throughput).

    from pogema_tpu.toolbox import evaluate
    results = evaluate({"size": 16, "num_agents": 8}, algo="A*",
                       seeds=[0, 1, 2])

    # or YAML-driven:
    #   python -m pogema_tpu.toolbox eval.yaml
    # with eval.yaml:
    #   algo: A*
    #   seeds: [0, 1, 2]
    #   environments:
    #     random-16: {size: 16, density: 0.3, num_agents: 8}
    #     warehouse: {map_name: warehouse-16x16, num_agents: 8}
"""

from __future__ import annotations

import json
import sys
from typing import Callable, Optional

import numpy as np

from .a_star_policy import BatchAStarAgent
from .envs import pogema_v0
from .grid_config import NUM_ACTIONS, GridConfig

ALGO_REGISTRY: dict = {}


def register_algo(name: str, factory: Callable) -> None:
    """factory() -> policy with .act(observations) -> list[int] and
    optionally .reset_states()."""
    ALGO_REGISTRY[name] = factory


class _RandomPolicy:
    def __init__(self, seed=0):
        self._rng = np.random.default_rng(seed)

    def act(self, observations):
        return self._rng.integers(NUM_ACTIONS, size=len(observations)).tolist()

    def reset_states(self):
        pass


class PPOPolicy:
    """A trained actor-critic checkpoint as a toolbox algo (name "PPO"):
    closes the train -> eval loop (train with examples/train_ppo.py
    --checkpoint, evaluate head-to-head with A*/random on the same maps).

    Model family and sizes are inferred from the checkpoint pytree saved
    by ``utils.checkpoint.save_checkpoint`` — ``embed_kernel`` + ``gru``
    means the recurrent :class:`~pogema_tpu.models.
    RecurrentEmbedActorCritic` (hidden state carried across ``act`` calls,
    cleared by ``reset_states``), ``embed_kernel`` alone the fused
    :class:`~pogema_tpu.models.EmbedActorCritic` (its obs-based
    ``__call__`` computes the same function as the training path),
    otherwise the conv :class:`~pogema_tpu.models.ActorCritic`.
    Consumes default 3-channel observations (observation_type='default').
    ``temperature=0`` acts greedily; >0 softmax-samples.
    """

    def __init__(self, checkpoint: str, temperature: float = 0.0, seed=0):
        import jax

        from .utils.checkpoint import restore_checkpoint

        self._params = restore_checkpoint(checkpoint)
        inner = self._params["params"]
        self._model = None
        self._h = None
        if "embed_kernel" in inner and "gru" in inner:
            from .models import RecurrentEmbedActorCritic

            ek = inner["embed_kernel"]  # [3, W*W, E]
            window = int(round(ek.shape[1] ** 0.5))
            model = RecurrentEmbedActorCritic(
                window=window, embed=int(ek.shape[2]),
                hidden=int(inner["gru"]["hr"]["kernel"].shape[1]),
            )
            self._model = model
            self._apply = jax.jit(lambda p, o, h: model.apply(p, o, h)[:2])
        elif "embed_kernel" in inner:
            from .models import EmbedActorCritic

            ek = inner["embed_kernel"]  # [3, W*W, E]
            window = int(round(ek.shape[1] ** 0.5))
            model = EmbedActorCritic(
                window=window, embed=int(ek.shape[2]),
                hidden=int(inner["trunk"]["kernel"].shape[1]),
            )
            self._apply = jax.jit(lambda p, o: model.apply(p, o)[0])
        else:
            from .models import ActorCritic

            model = ActorCritic(
                hidden=int(inner["trunk"]["kernel"].shape[1]),
                channels=int(inner["conv1"]["kernel"].shape[-1]),
            )
            self._apply = jax.jit(lambda p, o: model.apply(p, o)[0])
        self._temperature = float(temperature)
        self._rng = np.random.default_rng(seed)

    def act(self, observations, episode_start: bool = False):
        """``episode_start=True`` marks an episode boundary explicitly
        (equivalent to calling :meth:`reset_states` first) — for callers
        that drive the policy themselves instead of via ``run_episode``,
        so stale recurrent state cannot leak across episodes."""
        if episode_start:
            self.reset_states()
        obs = np.asarray(observations, np.float32)  # [N, 3, W, W]
        if self._model is not None:  # recurrent: thread the hidden state
            if self._h is None or self._h.shape[0] != obs.shape[0]:
                self._h = self._model.initial_carry((obs.shape[0],))
            self._h, logits = self._apply(self._params, obs, self._h)
            logits = np.asarray(logits, np.float64)
        else:
            logits = np.asarray(self._apply(self._params, obs), np.float64)
        if self._temperature > 0.0:
            # Gumbel-max sampling with the policy's own host RNG (the
            # eval harness is host-side; no need for device PRNG here).
            u = self._rng.uniform(1e-12, 1.0, size=logits.shape)
            logits = logits / self._temperature - np.log(-np.log(u))
        return np.argmax(logits, axis=-1).astype(int).tolist()

    def reset_states(self):
        self._h = None

    # gym-style alias: wrappers/harnesses that call ``policy.reset()``
    # at episode boundaries get the same state clear.
    def reset(self):
        self.reset_states()


def _planner_factory(**kwargs):
    # Lazy import: the planner pulls in the jitted device core.
    from .planner_policy import GlobalPlannerPolicy

    return GlobalPlannerPolicy(**kwargs)


register_algo("A*", BatchAStarAgent)
register_algo("random", _RandomPolicy)
register_algo("PPO", PPOPolicy)
# Centralized shortest-path baseline (privileged, needs
# observation_type='MAPF' in the environment kwargs).
register_algo("Planner", _planner_factory)


def run_episode(env, policy, max_steps: int = 10_000) -> dict:
    obs, infos = env.reset()
    if hasattr(policy, "reset_states"):
        policy.reset_states()
    for _ in range(max_steps):
        obs, rew, term, trunc, infos = env.step(policy.act(obs))
        if all(t or tr for t, tr in zip(term, trunc)):
            return dict(infos[0].get("metrics", {}))
    raise RuntimeError("episode never terminated")


def evaluate(environments, algo: str = "A*", seeds=(0,),
             algo_kwargs: Optional[dict] = None) -> dict:
    """environments: GridConfig kwargs dict, or {name: kwargs} mapping.
    Returns {env_name: {metric: mean over seeds}}."""
    if isinstance(environments, dict) and not any(
        isinstance(v, dict) for v in environments.values()
    ):
        environments = {"env": environments}
    results = {}
    for name, kwargs in environments.items():
        per_seed = []
        for seed in seeds:
            cfg = GridConfig(**{**kwargs, "seed": int(seed)})
            env = pogema_v0(cfg)
            policy = ALGO_REGISTRY[algo](**(algo_kwargs or {}))
            per_seed.append(run_episode(env, policy))
        keys = sorted({k for m in per_seed for k in m})
        results[name] = {
            k: float(np.mean([m[k] for m in per_seed if k in m])) for k in keys
        }
        results[name]["episodes"] = len(per_seed)
    return results


def evaluate_from_yaml(path: str) -> dict:
    import yaml

    with open(path) as f:
        spec = yaml.safe_load(f)
    return evaluate(
        spec["environments"],
        algo=spec.get("algo", "A*"),
        seeds=spec.get("seeds", [0]),
        algo_kwargs=spec.get("algo_kwargs"),
    )


def main(argv=None):  # pragma: no cover - thin CLI
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    results = evaluate_from_yaml(argv[0])
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
