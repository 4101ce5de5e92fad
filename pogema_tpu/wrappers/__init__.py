"""Host-side wrapper layer (upstream: pogema/wrappers/, SURVEY.md §2).

The jitted core already enforces the time limit and computes metrics
on-device; these classes exist for API parity with the reference (user
code that composes wrappers keeps working) and for wrapping arbitrary
multi-agent list-convention envs.
"""

from .metrics import (
    AbstractMetric,
    CSRMetric,
    EpLengthMetric,
    ISRMetric,
    LifeLongAttritionMetric,
    LifeLongAverageThroughputMetric,
    NonDisappearCSRMetric,
    NonDisappearEpLengthMetric,
    NonDisappearISRMetric,
    RuntimeMetricWrapper,
)
from .multi_time_limit import MultiTimeLimit
from .persistence import AgentState, PersistentWrapper

__all__ = [
    "MultiTimeLimit",
    "PersistentWrapper",
    "AgentState",
    "AbstractMetric",
    "ISRMetric",
    "CSRMetric",
    "EpLengthMetric",
    "LifeLongAverageThroughputMetric",
    "LifeLongAttritionMetric",
    "NonDisappearISRMetric",
    "NonDisappearCSRMetric",
    "NonDisappearEpLengthMetric",
    "RuntimeMetricWrapper",
]
