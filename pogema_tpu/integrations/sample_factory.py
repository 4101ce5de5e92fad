"""SampleFactory adapter (upstream: pogema/integrations/sample_factory.py,
SURVEY.md §2): auto-reset on episode end, multi-agent flags, metric
forwarding into the terminal info dicts."""

from __future__ import annotations

import gymnasium


class IsMultiAgentWrapper(gymnasium.Wrapper):
    """Exposes the flags SampleFactory sniffs for."""

    is_multiagent = True

    @property
    def num_agents(self):
        return self.env.num_agents


class MetricsForwardingWrapper(gymnasium.Wrapper):
    """Copies episode-end metrics into ``info['episode_extra_stats']``
    (SampleFactory's stats channel)."""

    def step(self, actions):
        obs, rew, term, trunc, infos = self.env.step(actions)
        for info in infos:
            if "metrics" in info:
                info.setdefault("episode_extra_stats", {}).update(info["metrics"])
        return obs, rew, term, trunc, infos


class AutoResetWrapper(gymnasium.Wrapper):
    """Resets on episode end and returns the first observations of the new
    episode, per SampleFactory's contract."""

    def step(self, actions):
        obs, rew, term, trunc, infos = self.env.step(actions)
        if all(t or tr for t, tr in zip(term, trunc)):
            obs, _ = self.env.reset()
        return obs, rew, term, trunc, infos
