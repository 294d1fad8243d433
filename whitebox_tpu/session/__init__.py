"""Session model: samples, clips, tracks, the session graph, project I/O.

This layer replaces the reference's ``src/engine`` *editing* half (clip.h,
clip_edit.h, track.h CRUD, engine.h edit API, assets_table, project.cpp) as
plain Python data + pure edit math. The *rendering* half (engine.cpp:1576,
track.cpp:587) lives in :mod:`whitebox_tpu.timeline` / :mod:`whitebox_tpu.ops`.
"""

from whitebox_tpu.session.clip import AudioClipData, Clip, ClipMode, ClipType, MidiClipData  # noqa: F401
from whitebox_tpu.session.sample import Sample  # noqa: F401
from whitebox_tpu.session.track import Track  # noqa: F401
from whitebox_tpu.session.session import Session  # noqa: F401
from whitebox_tpu.session.record import RecordingTake  # noqa: F401
