"""String-name → factory registries.

The reference resolves every component by name with ``getattr(module, name)``
(``runners/pytorch_runner_vae.py:35-64``: encoders, decoders, models,
posterior/prior nets, optimizers, schedulers).  We formalize that pattern into
explicit registries so configs stay strings while lookup errors become
actionable (closest-name suggestions instead of AttributeError).
"""
from __future__ import annotations

import difflib
from typing import Any, Callable, Dict, Iterator


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._factories: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str | None = None, aliases: tuple = ()):
        def deco(fn):
            key = name or fn.__name__
            keys = (key, *aliases)
            # validate every key BEFORE inserting any: a duplicate alias
            # must not leave the primary name half-registered
            dupes = [k for k in keys if k in self._factories]
            if dupes:
                raise KeyError(
                    f"duplicate {self.kind} registration: {', '.join(dupes)}")
            for k in keys:
                self._factories[k] = fn
            return fn
        return deco

    def get(self, name: str) -> Callable[..., Any]:
        try:
            return self._factories[name]
        except KeyError:
            close = difflib.get_close_matches(name, self._factories, n=3)
            hint = f" (did you mean {', '.join(close)}?)" if close else ""
            raise KeyError(
                f"unknown {self.kind} {name!r}{hint}; "
                f"registered: {sorted(self._factories)}"
            ) from None

    def build(self, name: str, *args, **kwargs) -> Any:
        return self.get(name)(*args, **kwargs)

    def __contains__(self, name: str) -> bool:
        return name in self._factories

    def __iter__(self) -> Iterator[str]:
        return iter(self._factories)


ENCODERS = Registry("encoder")
DECODERS = Registry("decoder")
MODELS = Registry("model")
LATENTS = Registry("latent net")   # posterior / prior networks
LOSSES = Registry("loss")
SCHEDULES = Registry("lr schedule")
