"""Imperative twin implementations used only as test oracles.

These deliberately mirror the reference's *state machines* step by step
(cited per function) so the vectorized kernels in ``kernels.py`` can be
property-tested against an independent derivation. Never used in Spark
jobs — the hot path is always the vectorized kernel.
"""

from __future__ import annotations

from collections import deque

from .codec import SEQ_NT4
from .kernels import MINIMISER_SENTINEL

_MAX = object()  # stands in for u64::MAX ("no active minimizer yet")


def kmer_iter_lazy(text: str | bytes, k: int):
    """Rolling (fwd, rc) k-mer pairs with OOV run reset, yielded one at
    a time — the streaming form backing pyapi.KmerGenerator (the
    reference's PyO3 iterator is also lazy/single-pass; an eager list
    would OOM on chromosome-scale inputs, code-review r5).

    Step-by-step port of the iterator semantics of kmer/src/kmer.rs:77-107.
    """
    data = text.encode("utf-8") if isinstance(text, str) else bytes(text)
    mask = (1 << (2 * k)) - 1
    shift = 2 * (k - 1)
    fval = rval = 0
    run = 0
    for b in data:
        code = int(SEQ_NT4[b])
        if code < 4:
            fval = ((fval << 2) | code) & mask
            rval = (rval >> 2) | ((code ^ 3) << shift)
            run += 1
        else:
            run = 0
        if run == k:
            run -= 1
            yield (fval, rval)


def kmer_iter(text: str | bytes, k: int) -> list[tuple[int, int]]:
    """Eager list form of kmer_iter_lazy (oracle/test convenience)."""
    return list(kmer_iter_lazy(text, k))


def minimiser_runs_imperative(
    text: str | bytes, w: int, m: int
) -> list[tuple[int, int, int]]:
    """Deque-based minimizer run emission.

    Faithful reimplementation of the state machine in
    kmer/src/minimiser.rs:58-176, including the flush-on-OOV rule
    (:81-101), the first-fill scan (:158-166), the rescan-on-evicted-min
    and break-on-smaller emissions (:114-152), the tail flush (:168-171)
    and the lost-final-run / sentinel quirks. u64::MAX is represented as
    MINIMISER_SENTINEL (-1) in the output.
    """
    data = text.encode("utf-8") if isinstance(text, str) else bytes(text)
    n = len(data)
    if n == 0:
        return []
    wsize = n if w == 0 else w
    msize = m
    if wsize < msize:
        return []
    W = wsize - msize + 1
    mask = (1 << (2 * msize)) - 1
    shift = 2 * (msize - 1)

    out: list[tuple[int, int, int]] = []
    fval = rval = 0
    run_len = 0
    active: object = _MAX
    win_start = 0
    buff: deque[int] = deque()
    buff_pos = 0

    def as_out(v: object) -> int:
        return MINIMISER_SENTINEL if v is _MAX else int(v)  # type: ignore[arg-type]

    pos = 0
    while pos < n:
        code = int(SEQ_NT4[data[pos]])
        if code < 4:
            fval = ((fval << 2) | code) & mask
            rval = (rval >> 2) | ((code ^ 3) << shift)
            run_len += 1
        else:
            should_return = len(buff) == W
            prev = (as_out(active), win_start, pos)
            buff_pos = 0
            active = _MAX
            fval = rval = 0
            run_len = 0
            win_start = pos + 1
            buff.clear()
            pos += 1
            if should_return:
                out.append(prev)
            continue

        if run_len < msize:
            pos += 1
            continue
        run_len -= 1
        mval = min(fval, rval)

        if len(buff) == W:
            buff.popleft()
            buff.append(mval)
            if buff_pos == 0:
                new_min, buff_pos = None, 0
                for j, v in enumerate(buff):
                    if new_min is None or v < new_min:
                        new_min, buff_pos = v, j
                if new_min != active:
                    out.append((as_out(active), win_start, pos))
                    active = new_min
                    win_start = pos - wsize + 1
                    pos += 1
                    continue
            elif mval < (active if active is not _MAX else mval + 1):  # type: ignore[operator]
                out.append((as_out(active), win_start, pos))
                active = mval
                buff_pos = len(buff) - 1
                win_start = pos - wsize + 1
                pos += 1
                continue
            else:
                buff_pos -= 1
        else:
            buff.append(mval)

        if active is _MAX and len(buff) == W:
            best = None
            for j, v in enumerate(buff):
                if best is None or v < best:
                    best, buff_pos = v, j
            active = best

        if pos == n - 1:
            pos += 1
            out.append((as_out(active), win_start, n))
            continue
        pos += 1
    return out
