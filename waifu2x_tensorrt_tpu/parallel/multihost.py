"""Multi-host work distribution (DCN level).

For multi-host rendering each host owns a disjoint slice of the work —
whole files, or frame ranges of one long video. This is coordination-free
(deterministic from (process_index, process_count)) so no collective setup
is needed beyond ``jax.distributed.initialize`` for the runtime itself.

No reference equivalent (single process there); design per SURVEY.md §2
parallelism inventory and §5 distributed-communication notes.
"""

from __future__ import annotations

from typing import Sequence, TypeVar

T = TypeVar("T")


def shard_files(
    files: Sequence[T],
    process_index: int | None = None,
    process_count: int | None = None,
) -> list[T]:
    """Round-robin file assignment: host i renders files i, i+P, i+2P, ...

    Round-robin (not contiguous blocks) so that a directory sorted by size
    doesn't put all large files on one host.
    """
    pi, pc = _resolve(process_index, process_count)
    return list(files[pi::pc])


def shard_frame_ranges(
    frame_count: int,
    process_index: int | None = None,
    process_count: int | None = None,
) -> tuple[int, int]:
    """Contiguous [start, stop) frame range for this host.

    Contiguous (not strided) so each host's ffmpeg child decodes one
    run and stops at its window's end (``-frames:v`` cap). The head
    [0, start) is still decoded-and-discarded on each host — frame-exact
    trim, no keyframe seek — so per-host decode cost grows with start;
    the encode/upscale work (the expensive part) is what shards evenly.
    Earlier hosts get the remainder frames. When frame_count <
    process_count, later hosts get an EMPTY (k, k) range — callers skip
    those (no segment to render).
    """
    pi, pc = _resolve(process_index, process_count)
    base = frame_count // pc
    rem = frame_count % pc
    start = pi * base + min(pi, rem)
    stop = start + base + (1 if pi < rem else 0)
    return start, stop


def _resolve(process_index, process_count) -> tuple[int, int]:
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index() if process_index is None else process_index
        process_count = jax.process_count() if process_count is None else process_count
    if not 0 <= process_index < process_count:
        raise ValueError(f"bad process_index {process_index}/{process_count}")
    return process_index, process_count
