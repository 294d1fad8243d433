"""MIDI layer: note model, SMF parsing, voice allocation, parity synth.

Mirrors src/core/midi.{h,cpp}, src/core/midi_file.cpp, src/engine/midi_voice
and src/engine/test_synth (the reference's only built-in instrument).
"""

from whitebox_tpu.midi.notes import MidiNote, MidiNoteBuffer  # noqa: F401
