"""Attribute-dict asset container + helpers.

Static assets (topology, LBS model, texture means, camera ids) are loaded
once on host and passed to every model/loss constructor, mirroring the
reference's AttrDict usage (ca_code/scripts/run_train.py:37-42).
"""

from __future__ import annotations

from typing import Any, Mapping


class AttrDict(dict):
    """dict with attribute access, recursively wrapping nested mappings."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            if isinstance(v, Mapping) and not isinstance(v, AttrDict):
                self[k] = AttrDict(v)

    def __getattr__(self, k: str) -> Any:
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k: str, v: Any) -> None:
        self[k] = v
