"""User-effect registry — the plughost plugin-manager analogue.

The reference persists *arbitrary* third-party processors by UID + state
blob and restores them from a registry on load
(src/plughost/plugin_manager.cpp:39-68, vst3host.cpp:146-160). Here the
same extensibility is a class registry: any ``Effect`` subclass that can
serialize itself (``as_dict``/``from_dict``) registers under a type name
and then round-trips through ``.wb`` exactly like the built-in family::

    @register_effect("myfx")
    class MyFx(Effect):
        def as_dict(self): return {"amount": self.amount}
        @classmethod
        def from_dict(cls, d): return cls(float(d["amount"]))

Persisted form is ``{"type": <name>, "state": <as_dict blob>}``. The blob
must be msgpack-safe under the wbpr packing rules (``use_bin_type=False``):
str keys, numbers, lists, strings — embed binary as base64 (see
ConvolutionReverb's inline IR for the pattern).

Unknown types on load degrade gracefully (plugin_manager's missing-plugin
path): the document is preserved verbatim in an :class:`UnknownEffect`
that processes as a bypass and re-serializes identically, so opening a
project from a machine with extra effects installed never loses data.

To additionally ride the batched generic/routed/sharded pipelines (tracks
grouped by chain signature), a registered class may implement the *stage
protocol* consumed by ``render/effects_generic.py``:

- ``static_config() -> tuple``      hashable config (part of the group
  signature; tracks with equal configs compile as one program)
- ``param_arrays() -> dict``        per-instance numeric params, stacked
  across the group into ``[B, ...]`` device arrays
- ``stage_init_state(static, params, B, C)`` classmethod -> state pytree
- ``stage_apply(static, params, x, state, n0, sample_rate, key=None,
  lanes=None)`` classmethod: ``x [B, C, Fc] -> (y, new_state)`` — must
  satisfy the chunked == one-shot contract (state threading), like every
  built-in. ``key`` is the sidechain feed; ``lanes`` holds evaluated
  per-frame automation values ``{name: [B, Fc]}`` for params the class
  lists in an ``automatable`` class attribute (an iterable of raw names).

Effects without the stage protocol still work through ``Effect.process``
references and persist fine; they just can't join batched renders.

Optionally a class may provide ``reference_process(x_f64, lanes=None) ->
y_f64`` — the f64 host reference used by ``reference_run_chain`` in
parity tests (``lanes``: per-frame values {name: [F]} of any automated
params). Without it the effect's own ``process`` serves as its reference.
"""

from __future__ import annotations

from whitebox_tpu.effects.base import Effect
from whitebox_tpu.log import get_logger

_log = get_logger("effects.registry")

# .wb type tags owned by the built-in family (project.py) — user
# registrations must not shadow them.
BUILTIN_TYPES = frozenset({
    "gain", "biquad", "eq", "linphase", "compressor", "limiter", "gate",
    "delay", "chorus", "flanger", "convreverb", "saturator", "width",
})

_REGISTRY: dict[str, type[Effect]] = {}
_BY_CLASS: dict[type, str] = {}


def register_effect(type_name: str, cls: type[Effect] | None = None):
    """Register ``cls`` under ``type_name`` for ``.wb`` persistence.

    Usable directly (``register_effect("myfx", MyFx)``) or as a class
    decorator (``@register_effect("myfx")``). Requirements:

    - ``cls`` subclasses :class:`Effect`
    - ``cls.as_dict(self) -> dict`` and ``cls.from_dict(d) -> cls`` exist
    - ``type_name`` is not a built-in type tag

    Registration sets ``cls.name = type_name`` (the generic-pipeline kind
    string) unless the class already chose the same name. Re-registering
    the same class under the same name is idempotent; a different class
    under a taken name replaces it with a warning (latest wins — the
    reload-in-notebook workflow).
    """
    if cls is None:
        return lambda c: register_effect(type_name, c)
    if not isinstance(type_name, str) or not type_name:
        raise ValueError(f"effect type name must be a non-empty str, got {type_name!r}")
    if type_name in BUILTIN_TYPES:
        raise ValueError(f"effect type {type_name!r} is a built-in; pick another name")
    if not (isinstance(cls, type) and issubclass(cls, Effect)):
        raise TypeError(f"{cls!r} must be an Effect subclass")
    if not callable(getattr(cls, "as_dict", None)) or not callable(getattr(cls, "from_dict", None)):
        raise TypeError(
            f"{cls.__name__} must define as_dict(self) and from_dict(cls, d) "
            f"to persist through .wb"
        )
    prev = _REGISTRY.get(type_name)
    if prev is not None and prev is not cls:
        _log.warning("effect type %r re-registered: %s -> %s",
                     type_name, prev.__name__, cls.__name__)
        _BY_CLASS.pop(prev, None)
    existing = getattr(cls, "name", Effect.name)
    if existing != type_name:
        if existing not in (Effect.name, None) and prev is not cls:
            _log.info("effect class %s.name %r set to registry name %r",
                      cls.__name__, existing, type_name)
        cls.name = type_name
    _REGISTRY[type_name] = cls
    _BY_CLASS[cls] = type_name
    return cls


def unregister_effect(type_name: str) -> None:
    cls = _REGISTRY.pop(type_name, None)
    if cls is not None:
        _BY_CLASS.pop(cls, None)


def lookup_effect(type_name: str):
    """Registered class for a .wb type tag, or None."""
    return _REGISTRY.get(type_name)


def type_name_of(cls: type) -> str | None:
    """Registry name for a class (exact class only — subclasses register
    themselves)."""
    return _BY_CLASS.get(cls)


class UnknownEffect(Effect):
    """Placeholder for a persisted effect whose type isn't registered.

    Bypasses audio (identity), keeps latency/tail at 0, and re-serializes
    the original document verbatim so a save/load cycle on a machine
    without the defining package is lossless (plugin_manager.cpp's
    missing-plugin behavior, minus the crash)."""

    name = "unknown"

    def __init__(self, type_name: str, state: dict | None = None) -> None:
        super().__init__()
        self.type_name = str(type_name)
        self.state = dict(state or {})

    def init_state(self, channels: int):
        return ()

    def process(self, x, state):
        return x, state

    def static_config(self) -> tuple:
        return (self.type_name,)

    def param_arrays(self) -> dict:
        return {}

    @classmethod
    def stage_init_state(cls, static, params, B: int, C: int):
        return ()

    @classmethod
    def stage_apply(cls, static, params, x, state, n0, sample_rate,
                    key=None, lanes=None):
        return x, state

    def as_dict(self) -> dict:
        return dict(self.state)

    @classmethod
    def from_dict(cls, d: dict) -> "UnknownEffect":  # pragma: no cover
        raise TypeError("UnknownEffect is constructed by the loader, not from_dict")

    def __repr__(self) -> str:
        return f"UnknownEffect({self.type_name!r})"
