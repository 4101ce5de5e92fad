"""Doc-example tests: the README's python snippets actually run
(SURVEY.md §4 item 7 — upstream executes README usage snippets in CI).

Python fenced blocks are extracted verbatim and exec'd in order in one
shared namespace (later blocks may use earlier blocks' names, exactly as
a reader would paste them). The only transformation is a size
substitution for the config-C-scale core block so CI-on-CPU finishes in
seconds — the code text is otherwise untouched.
"""

import os
import re

import pytest

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "README.md")

_SCALE_DOWN = [
    ("size=64", "size=12"),
    # batch stays divisible by the 8 virtual devices (the mesh block
    # shards it over Mesh('data'))
    ("num_envs=4096", "num_envs=8"),
    ("num_agents=64", "num_agents=3"),
    ("(4096, 64)", "(8, 3)"),
    ("num_vec_envs=1024", "num_vec_envs=8"),
]


def _python_blocks(text):
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_readme_python_snippets_execute():
    with open(README) as f:
        blocks = _python_blocks(f.read())
    assert len(blocks) >= 3, "README lost its python examples"
    ns = {}
    for i, block in enumerate(blocks):
        for a, b in _SCALE_DOWN:
            block = block.replace(a, b)
        try:
            exec(compile(block, f"README.md:block{i}", "exec"), ns)
        except Exception as e:  # pragma: no cover - diagnostic
            pytest.fail(f"README python block {i} failed: {e}\n{block}")
    # The quickstart block produced a live env with the documented API.
    assert "env" in ns and hasattr(ns["env"], "step")
    # The core block produced state/obs/metrics.
    assert "metrics" in ns
