"""Forward error correction: convolutional codes (Viterbi) and
Reed-Solomon.

reference: core/libcorrect (vendored) — convolutional r=1/2 K=7..9 codes
and RS(255,223), used by the decoder modules (meteor, falcon9, pager,
M17…).  The Viterbi decoder runs as a ``lax.scan`` over the trellis with
all 2^(K-1) states updated in parallel per step (an ideal VPU shape);
Reed-Solomon is host-side numpy over GF(256) (tiny blocks at decode
rates, like the reference's CPU path).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# CCSDS / "NASA standard" K=7 rate-1/2 polynomials (libcorrect's default)
G1, G2 = 0o171, 0o133


def conv_encode(bits: np.ndarray, g1: int = G1, g2: int = G2,
                k: int = 7) -> np.ndarray:
    """Rate-1/2 convolutional encoder (zero-flushed)."""
    bits = np.asarray(bits, np.uint8)
    state = 0
    out = np.empty(2 * (len(bits) + k - 1), np.uint8)
    idx = 0
    for b in list(bits) + [0] * (k - 1):
        state = ((state << 1) | int(b)) & ((1 << k) - 1)
        out[idx] = bin(state & g1).count("1") & 1
        out[idx + 1] = bin(state & g2).count("1") & 1
        idx += 2
    return out


def _branch_tables(g1: int, g2: int, k: int):
    """For each (state, input bit): output pair and next state."""
    n_states = 1 << (k - 1)
    nxt = np.zeros((n_states, 2), np.int32)
    outs = np.zeros((n_states, 2, 2), np.float32)
    for s in range(n_states):
        for b in (0, 1):
            full = ((s << 1) | b) & ((1 << k) - 1)
            nxt[s, b] = full & (n_states - 1)
            outs[s, b, 0] = bin(full & g1).count("1") & 1
            outs[s, b, 1] = bin(full & g2).count("1") & 1
    return nxt, outs


def viterbi_decode(soft: jnp.ndarray, g1: int = G1, g2: int = G2,
                   k: int = 7) -> np.ndarray:
    """Soft-decision Viterbi decode of a rate-1/2 stream.

    ``soft``: [2*N] values in [0,1] (0 → bit 0, 1 → bit 1; hard bits
    work too).  Returns the N-(k-1) decoded data bits (zero-flush
    assumed).  The add-compare-select over all states is one vectorized
    scan step.
    """
    soft = jnp.asarray(soft, jnp.float32).reshape(-1, 2)
    N = soft.shape[0]
    n_states = 1 << (k - 1)
    nxt, outs = _branch_tables(g1, g2, k)
    nxt_j = jnp.asarray(nxt)          # [S, 2]
    outs_j = jnp.asarray(outs)        # [S, 2, 2]

    big = jnp.float32(1e9)
    init = jnp.full((n_states,), big).at[0].set(0.0)

    def step(metrics, obs):
        # branch metric for (state, bit): |obs - expected|^2 summed
        bm = jnp.sum((obs[None, None, :] - outs_j) ** 2, axis=-1)  # [S,2]
        cand = metrics[:, None] + bm                               # [S,2]
        flat_next = nxt_j.reshape(-1)                              # [S*2]
        flat_cand = cand.reshape(-1)
        # for each next state take the min over incoming branches
        new = jnp.full((n_states,), big)
        new = new.at[flat_next].min(flat_cand)
        # record argmin origin for traceback
        # origin index = s*2+b achieving the min for each next state
        is_min = flat_cand <= new[flat_next] + 1e-6
        origin = jnp.full((n_states,), -1, jnp.int32)
        origin = origin.at[flat_next].max(
            jnp.where(is_min, jnp.arange(n_states * 2, dtype=jnp.int32),
                      -1))
        return new, origin

    final, origins = jax.lax.scan(step, init, soft)
    origins = np.asarray(origins)                  # [N, S]
    # traceback from best final state (flushed → state 0 ideally)
    s = int(np.argmin(np.asarray(final)))
    bits = np.zeros(N, np.uint8)
    for t in range(N - 1, -1, -1):
        o = origins[t, s]
        bits[t] = o & 1
        s = o >> 1
    return bits[:N - (k - 1)]


# ----------------------------------------------------------------------
# Reed-Solomon over GF(256), primitive poly 0x11d (RS(255,223) default —
# the CCSDS/libcorrect configuration)

_PRIM = 0x11D
_EXP = np.zeros(512, np.int32)
_LOG = np.zeros(256, np.int32)
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x <<= 1
    if _x & 0x100:
        _x ^= _PRIM
_EXP[255:510] = _EXP[:255]


def _gmul(a, b):
    if a == 0 or b == 0:
        return 0
    return int(_EXP[(_LOG[a] + _LOG[b]) % 255])


def _poly_mul(p, q):
    r = [0] * (len(p) + len(q) - 1)
    for i, a in enumerate(p):
        for j, b in enumerate(q):
            r[i + j] ^= _gmul(a, b)
    return r


def rs_generator(nsym: int) -> List[int]:
    g = [1]
    for i in range(nsym):
        g = _poly_mul(g, [1, int(_EXP[i])])
    return g


def rs_encode(data: bytes, nsym: int = 32) -> bytes:
    """Systematic RS encode: returns data + nsym parity bytes."""
    gen = rs_generator(nsym)
    rem = [0] * nsym
    for b in data:
        factor = b ^ rem[0]
        rem = rem[1:] + [0]
        if factor:
            for i in range(nsym):
                rem[i] ^= _gmul(gen[i + 1], factor)
    return bytes(data) + bytes(rem)


def _ginv(a):
    return int(_EXP[(255 - _LOG[a]) % 255])


def _poly_scale(p, x):
    return [_gmul(c, x) for c in p]


def _poly_add(p, q):
    r = [0] * max(len(p), len(q))
    r[len(r) - len(p):] = [c for c in p]
    for i, c in enumerate(q):
        r[i + len(r) - len(q)] ^= c
    return r


def _poly_eval(p, x):
    """Evaluate polynomial (coefficients highest-order first)."""
    y = 0
    for c in p:
        y = _gmul(y, x) ^ int(c)
    return y


def _syndromes(msg, nsym: int):
    return [int(_poly_eval(list(msg), int(_EXP[i]))) for i in range(nsym)]


def rs_decode(block: bytes, nsym: int = 32) -> Optional[bytes]:
    """Berlekamp-Massey + Chien search + Forney. Returns corrected data
    (parity stripped) or None if uncorrectable.  Standard erasureless
    decoder (the classic public formulation, e.g. "Reed-Solomon codes
    for coders")."""
    msg = list(block)
    n = len(msg)
    synd = _syndromes(msg, nsym)
    if max(synd) == 0:
        return bytes(block[:-nsym])

    # Berlekamp-Massey (coefficients highest-order first)
    err_loc = [1]
    old_loc = [1]
    for i in range(nsym):
        old_loc.append(0)
        delta = synd[i]
        for j in range(1, len(err_loc)):
            delta ^= _gmul(err_loc[-(j + 1)], synd[i - j])
        if delta != 0:
            if len(old_loc) > len(err_loc):
                new_loc = _poly_scale(old_loc, delta)
                old_loc = _poly_scale(err_loc, _ginv(delta))
                err_loc = new_loc
            err_loc = _poly_add(err_loc, _poly_scale(old_loc, delta))
    while err_loc and err_loc[0] == 0:
        err_loc.pop(0)
    n_err = len(err_loc) - 1
    if n_err * 2 > nsym:
        return None

    # Chien search: err_loc(alpha^i) == 0  =>  coef power cp = 255-i,
    # byte position p = n-1-cp
    err_pos = []
    coef_pos = []
    for i in range(255):
        if _poly_eval(err_loc, _pow(2, i)) == 0:
            cp = (255 - i) % 255
            p = n - 1 - cp
            if 0 <= p < n:
                err_pos.append(p)
                coef_pos.append(cp)
    if len(err_pos) != n_err:
        return None

    # Forney (roots start at alpha^0):
    #   omega(x) = S(x)*Lambda(x) mod x^n_err          (low-order first)
    #   e_k = omega(X_k^-1) / prod_{j!=k}(1 ^ X_j*X_k^-1)
    def conv_low(p, q):
        r = [0] * (len(p) + len(q) - 1)
        for a, pa in enumerate(p):
            for b, qb in enumerate(q):
                r[a + b] ^= _gmul(pa, qb)
        return r

    X = [_pow(2, cp) for cp in coef_pos]
    eloc_low = [1]
    for x in X:
        eloc_low = conv_low(eloc_low, [1, x])
    omega_low = conv_low(synd, eloc_low)[:n_err]

    def eval_low(p, y):
        acc = 0
        yp = 1
        for c in p:
            acc ^= _gmul(c, yp)
            yp = _gmul(yp, y) if yp else 0
        return acc

    out = list(msg)
    for k, p in enumerate(err_pos):
        xk_inv = _ginv(X[k])
        prod = 1
        for j in range(len(X)):
            if j != k:
                prod = _gmul(prod, 1 ^ _gmul(X[j], xk_inv))
        if prod == 0:
            return None
        mag = _gmul(eval_low(omega_low, xk_inv), _ginv(prod))
        out[p] ^= mag
    if max(_syndromes(out, nsym)) != 0:
        return None
    return bytes(out[:-nsym])


def _pow(a, nexp):
    if nexp == 0:
        return 1
    if a == 0:
        return 0
    return int(_EXP[(_LOG[a] * nexp) % 255])
