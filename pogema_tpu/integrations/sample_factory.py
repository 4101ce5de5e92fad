"""SampleFactory adapter (upstream: pogema/integrations/sample_factory.py,
SURVEY.md §2): auto-reset on episode end, multi-agent flags, metric
forwarding into the terminal info dicts."""

from __future__ import annotations

import gymnasium


class _ForwardFlags(gymnasium.Wrapper):
    """gymnasium 1.x wrappers no longer auto-forward attributes; expose
    the flags SampleFactory sniffs for explicitly at every layer."""

    @property
    def is_multiagent(self):
        return getattr(self.env, "is_multiagent", True)

    @property
    def num_agents(self):
        return self.env.num_agents


class IsMultiAgentWrapper(_ForwardFlags):
    is_multiagent = True


class MetricsForwardingWrapper(_ForwardFlags):
    """Copies episode-end metrics into ``info['episode_extra_stats']``
    (SampleFactory's stats channel)."""

    def step(self, actions):
        obs, rew, term, trunc, infos = self.env.step(actions)
        for info in infos:
            if "metrics" in info:
                info.setdefault("episode_extra_stats", {}).update(info["metrics"])
        return obs, rew, term, trunc, infos


class AutoResetWrapper(_ForwardFlags):
    """Resets on episode end and returns the first observations of the new
    episode, per SampleFactory's contract."""

    def step(self, actions):
        obs, rew, term, trunc, infos = self.env.step(actions)
        if all(t or tr for t, tr in zip(term, trunc)):
            obs, _ = self.env.reset()
        return obs, rew, term, trunc, infos
