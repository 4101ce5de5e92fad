"""pogema_tpu — a TPU-native, vectorized rebuild of POGEMA
(CognitiveAISystems/pogema): partially observable multi-agent grid
environments for MAPF/LMAPF, as pure-functional JAX programs batched over
thousands of env instances and sharded over TPU meshes.

Public surface mirrors the reference package exports
(upstream: pogema/__init__.py, SURVEY.md §2 "Package surface") plus the
new vectorized core (:class:`pogema_tpu.core.PogemaCore`).
"""

from .core import EnvState, PogemaCore, StepResult
from .grid_config import FREE, MOVES, NUM_ACTIONS, OBSTACLE, GridConfig

__version__ = "0.1.0"


def _register_gym_env():
    # Mirror the reference's gymnasium registration ("Pogema-v0").
    try:
        import gymnasium

        if "Pogema-v0" not in gymnasium.registry:
            gymnasium.register(
                id="Pogema-v0",
                entry_point="pogema_tpu.envs:_make_pogema_gym_entry",
                disable_env_checker=True,
            )
    except Exception:  # pragma: no cover - registration is best-effort
        pass


_register_gym_env()

__all__ = [
    "GridConfig",
    "PogemaCore",
    "EnvState",
    "StepResult",
    "FREE",
    "OBSTACLE",
    "MOVES",
    "NUM_ACTIONS",
    "__version__",
]


def __getattr__(name):
    # Lazy imports for the compatibility rim so the JAX core stays
    # importable without gymnasium extras being touched at import time.
    if name in (
        "pogema_v0",
        "Pogema",
        "PogemaLifeLong",
        "PogemaCoopFinish",
        "ActionsSampler",
    ):
        from . import envs

        return getattr(envs, name)
    if name in ("AnimationMonitor", "AnimationConfig"):
        from . import animation

        return getattr(animation, name)
    if name in ("AStarAgent", "BatchAStarAgent"):
        from . import a_star_policy

        return getattr(a_star_policy, name)
    if name == "GlobalPlannerPolicy":
        from .planner_policy import GlobalPlannerPolicy

        return GlobalPlannerPolicy
    if name == "PogemaVectorEnv":
        from .integrations.vector import PogemaVectorEnv

        return PogemaVectorEnv
    raise AttributeError(f"module 'pogema_tpu' has no attribute {name!r}")
