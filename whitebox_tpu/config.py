"""Settings persistence — replaces src/config.{h,cpp}.

The reference stores device/engine settings as JSON at a platform path
(config.cpp:17,28-126 load / :158-196 save; keys: audio type/device ids/
buffer size/sample rate/exclusive mode, plus browser user_dirs). The
offline framework keeps the same shape minus physical devices: render
defaults + user sample directories + engine selection.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from pathlib import Path


def default_settings_path() -> Path:
    base = os.environ.get("XDG_CONFIG_HOME") or os.path.join(os.path.expanduser("~"), ".config")
    return Path(base) / "whitebox_tpu" / "settings.json"


def enable_compilation_cache(cache_dir=None) -> Path:
    """Persist XLA compilations across CLI invocations.

    The reference's plugin contract is init-once/process-many
    (plugin_interface.h:142); an offline CLI re-jits from scratch every
    run unless the JAX persistent compilation cache is on. Safe to call
    repeatedly; returns the cache directory."""
    import jax

    base = cache_dir or os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    p = Path(base) / "whitebox_tpu" / "xla_cache"
    p.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(p))
    # cache every compilation the moment it takes noticeable time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return p


@dataclass
class Settings:
    # audio.* (config.cpp keys, device ids dropped — no realtime devices)
    sample_rate: int = 48000
    buffer_size: int = 512  # emulated engine block (event semantics)
    output_channels: int = 2
    # render.*
    engine: str = "auto"  # pallas | xla | auto
    interpolation: str = "linear"  # linear | sinc
    chunk_frames: int = 1 << 17
    strict_order: bool = True
    # browser user directories (config.cpp user_dirs)
    user_dirs: list[str] = field(default_factory=list)

    def save(self, path=None) -> Path:
        p = Path(path) if path is not None else default_settings_path()
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(asdict(self), indent=2))
        return p

    @staticmethod
    def load(path=None) -> "Settings":
        p = Path(path) if path is not None else default_settings_path()
        if not p.is_file():
            return Settings()
        try:
            doc = json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            return Settings()
        s = Settings()
        for k, v in doc.items():
            if hasattr(s, k):
                setattr(s, k, v)
        return s
