"""Record an episode and save SVG animations (plain + egocentric),
mirroring the reference's AnimationMonitor usage.

  python examples/animate.py   # writes renders/*.svg
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from pogema_tpu import (
    AnimationConfig,
    AnimationMonitor,
    BatchAStarAgent,
    GridConfig,
    pogema_v0,
)

env = AnimationMonitor(
    pogema_v0(GridConfig(seed=7, size=12, density=0.25, num_agents=4,
                         obs_radius=3, max_episode_steps=48,
                         observation_type="POMAPF")),
    AnimationConfig(directory="renders", save_every_idx_episode=None),
)
agent = BatchAStarAgent()
obs, _ = env.reset()
while True:
    obs, rew, term, trunc, infos = env.step(agent.act(obs))
    if all(t or tr for t, tr in zip(term, trunc)):
        break
print("metrics:", infos[0]["metrics"])
print(env.save_animation("renders/episode.svg"))
print(env.save_animation("renders/episode_ego.svg",
                         AnimationConfig(egocentric_idx=0)))
print(env.save_animation("renders/episode_static.svg",
                         AnimationConfig(static=True)))

# Same scenario under the batched global planner (privileged MAPF obs).
from pogema_tpu import GlobalPlannerPolicy  # noqa: E402

env2 = AnimationMonitor(
    pogema_v0(GridConfig(seed=7, size=12, density=0.25, num_agents=4,
                         obs_radius=3, max_episode_steps=48,
                         observation_type="MAPF")),
    AnimationConfig(directory="renders", save_every_idx_episode=None),
)
planner = GlobalPlannerPolicy()
obs, _ = env2.reset()
while True:
    obs, rew, term, trunc, infos = env2.step(planner.act(obs))
    if all(t or tr for t, tr in zip(term, trunc)):
        break
print("planner metrics:", infos[0]["metrics"])
print(env2.save_animation("renders/planner_episode.svg"))
