"""Agent registry (reference tasks/agents/__init__.py:12-14)."""
from ..utils.registry import AGENTS


def load_agent(name: str, *args, **kwargs):
    return AGENTS.build(name, *args, **kwargs)


from . import mp3d_agent, llava_agent  # noqa: E402,F401 isort:skip
