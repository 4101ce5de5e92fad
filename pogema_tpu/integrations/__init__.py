"""Framework integration adapters (upstream: pogema/integrations/,
SURVEY.md §2) — thin host shims over :class:`pogema_tpu.envs.Pogema`."""
