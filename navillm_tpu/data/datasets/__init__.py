"""Dataset registry (reference tasks/datasets/__init__.py:14-16)."""
from ...utils.registry import DATASETS


def load_dataset(name: str, *args, **kwargs):
    return DATASETS.build(name, *args, **kwargs)


# register on import
from . import r2r, cvdn, reverie, soon, eqa, scanqa, llava, aug  # noqa: E402,F401
