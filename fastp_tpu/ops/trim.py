"""Global trimming + sliding-window quality cutting.

Batched, mask-based re-derivation of the reference's per-read rolling-window
loops (reference: src/filter.cpp:83-222). All window means are computed with
cumulative sums; "first index where..." selections replicate the loop's exact
break semantics, including:
  * the `if (s > 0) s = s + w - 1` forwarding quirk
  * leading/trailing 'N' stripping after front/tail cuts
  * `cut_right` keeping good bases inside the low-quality window
  * NULL (dropped-read) conditions `rlen <= 0 || front >= l-1` and the
    window-does-not-fit checks.
Returns (front, rlen, alive) per read; alive=False corresponds to the
reference returning NULL.
"""
from __future__ import annotations

import jax.numpy as jnp

from .common import pos_iota, first_true_index, N


def _window_sums(quals_i32, w: int):
    """sums[b, s] = sum(quals[s : s+w]) for any s (0 beyond row end).

    quals beyond the read length are 0, which matches the reference only when
    indices stay within [front, l-tail-w]; callers mask the valid s range.
    Gather-free: cumsum + static slices (edge-padded).
    """
    B, L = quals_i32.shape
    c = jnp.cumsum(quals_i32, axis=1)
    c = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), c], axis=1)  # [B, L+1]
    # sums[s] = c[min(s+w, L)] - c[s]
    total = c[:, L:L + 1]
    if w <= L:
        end = jnp.concatenate([c[:, w:], jnp.broadcast_to(total, (B, w - 1))], axis=1)
    else:
        end = jnp.broadcast_to(total, (B, L))
    return end - c[:, :L]  # [B, L]


def trim_and_cut(bases, quals, lengths, front_arg: int, tail_arg: int, cfg):
    """reference: src/filter.cpp:83-222 (Filter::trimAndCut).

    cfg must expose: enabledFront/enabledTail/enabledRight,
    windowSizeFront/qualityFront, windowSizeTail/qualityTail,
    windowSizeRight/qualityRight (static Python values).
    Returns (front[B], rlen[B], alive[B]).
    """
    B, L = bases.shape
    q = quals.astype(jnp.int32)
    l = lengths.astype(jnp.int32)
    pos = pos_iota(B, L)

    any_cut = cfg.enabledFront or cfg.enabledTail or cfg.enabledRight

    if front_arg == 0 and tail_arg == 0 and not any_cut:
        return (jnp.zeros_like(l), l, jnp.ones((B,), bool))

    rlen = l - front_arg - tail_arg
    if not any_cut:
        # plain global trimming; NULL only when rlen < 0
        alive = rlen >= 0
        front = jnp.full_like(l, front_arg)
        # reference keeps frontTrimmed=0 when front==0 (resize-only path),
        # but front offset is 0 anyway, so nothing special to track.
        return (jnp.where(alive, front, 0),
                jnp.where(alive, rlen, 0), alive)

    alive = jnp.ones((B,), bool)
    front = jnp.full_like(l, front_arg)

    if cfg.enabledFront:
        w = cfg.windowSizeFront
        thresh = (33 + cfg.qualityFront) * w  # compare sum*1 >= thresh <=> mean >= 33+q
        alive = alive & (l - front - tail_arg - w > 0)
        sums = _window_sums(q, w)
        # loop s in [front, l-tail-w-1]; break at first mean >= 33+q, else s = l-tail-w
        s_lo = front[:, None]
        s_hi = (l - tail_arg - w)[:, None]  # exclusive upper bound of loop body
        hit = (sums >= thresh) & (pos >= s_lo) & (pos < s_hi)
        s = first_true_index(hit, default=(l - tail_arg - w))
        s = jnp.where(s > 0, s + w - 1, s)
        # strip leading Ns: while s < l and seq[s]=='N': s++
        non_n_at_or_after = (bases != N) & (pos >= s[:, None]) & (pos < l[:, None])
        s = first_true_index(non_n_at_or_after, default=l)
        front = s
        rlen = l - front - tail_arg

    if cfg.enabledRight:
        w = cfg.windowSizeRight
        qr = 33 + cfg.qualityRight
        thresh = qr * w
        alive = alive & (l - front - tail_arg - w > 0)
        sums = _window_sums(q, w)
        s_lo = front[:, None]
        s_hi = (l - tail_arg - w)[:, None]
        low = (sums < thresh) & (pos >= s_lo) & (pos < s_hi)
        found = jnp.any(low, axis=1)
        s = first_true_index(low, default=jnp.zeros_like(l))
        # while s < l-1 and qual[s] >= qr: s++  -> first t >= s with qual<qr or l-1
        bad_or_end = ((q < qr) | (pos >= (l - 1)[:, None])) & (pos >= s[:, None])
        s2 = first_true_index(bad_or_end, default=(l - 1))
        rlen = jnp.where(found, s2 - front, rlen)

    if cfg.enabledTail and not cfg.enabledRight:
        w = cfg.windowSizeTail
        thresh = (33 + cfg.qualityTail) * w
        alive = alive & (l - front - tail_arg - w > 0)
        # windows end at t (cover [t-w+1, t]); loop t from l-tail-1 down to front+w
        sums = _window_sums(q, w)  # sums[s] covers [s, s+w-1]; window at t = sums[t-w+1]
        t_start = (l - tail_arg - 1)[:, None]
        t_end = (front + w)[:, None]  # inclusive lower bound of loop body
        win_start = pos - w + 1  # start index of window ending at t=pos
        win_ok = (pos <= t_start) & (pos >= t_end) & (win_start >= 0)
        # sums_at_win_start[j] = sums[j - (w-1)]: static right shift
        if w - 1 > 0:
            if w - 1 >= L:
                sums_sh = jnp.zeros_like(sums)
            else:
                sums_sh = jnp.concatenate(
                    [jnp.zeros((B, w - 1), jnp.int32), sums[:, :L - (w - 1)]], axis=1)
        else:
            sums_sh = sums
        good = jnp.where(win_ok, sums_sh >= thresh, False)
        # first t scanning DOWN from l-tail-1 = LAST t in ascending order... no:
        # the loop goes t descending and breaks at the first (largest) good t.
        found_t = jnp.any(good, axis=1)
        # index of last True along axis 1:
        rev_idx = (L - 1) - jnp.argmax(good[:, ::-1], axis=1).astype(jnp.int32)
        t = jnp.where(found_t, rev_idx, front + w - 1)  # no-break leaves t=front+w-1
        t = jnp.where(t < l - 1, t - w + 1, t)
        # strip trailing Ns: while t >= 0 and seq[t]=='N': t--
        non_n_at_or_before = (bases != N) & (pos <= t[:, None])
        has = jnp.any(non_n_at_or_before, axis=1)
        last_non_n = (L - 1) - jnp.argmax(non_n_at_or_before[:, ::-1], axis=1).astype(jnp.int32)
        t = jnp.where(has, last_non_n, -1)
        rlen = t - front + 1

    alive = alive & (rlen > 0) & (front < l - 1)
    front = jnp.where(alive, front, 0)
    rlen = jnp.where(alive, rlen, 0)
    return front, rlen, alive
