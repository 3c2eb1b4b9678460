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

import math
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


# ----------------------------------------------------------------------
# Generalized Reed-Solomon (parameterized field poly / first root / root
# gap) — the CCSDS configurations libcorrect exposes, e.g. the Falcon-9
# downlink's RS(255,239) with prim poly 0x187, fcr=120, gap=11
# (reference: decoder_modules/falcon9_decoder/src/falcon_fec.h:96).

class ReedSolomon:
    """RS(255, 255−nroots) over GF(256) with roots α^(fcr+i·gap).

    The gap≠1 case is solved by substitution: with β = α^gap (primitive
    when gcd(gap,255)=1) the syndromes S_i = Σ Y_k·Z_k^i are a standard
    BM problem over Z_k = X_k^gap with Y_k = e_k·X_k^fcr; positions
    come back through X_k = Z_k^(gap⁻¹ mod 255).
    """

    def __init__(self, nroots: int = 16, fcr: int = 120, gap: int = 11,
                 prim_poly: int = 0x187):
        assert math.gcd(gap, 255) == 1, gap
        self.nroots = int(nroots)
        self.fcr = int(fcr)
        self.gap = int(gap)
        self.exp = np.zeros(512, np.int32)
        self.log = np.zeros(256, np.int32)
        x = 1
        for i in range(255):
            self.exp[i] = x
            self.log[x] = i
            x <<= 1
            if x & 0x100:
                x ^= prim_poly
        self.exp[255:510] = self.exp[:255]
        self.gap_inv = pow(gap, -1, 255)
        # generator polynomial (highest-order first)
        g = [1]
        for i in range(nroots):
            r = self._pow_a(fcr + i * gap)
            g = self._poly_mul(g, [1, r])
        self.gen = g

    # -- GF helpers -----------------------------------------------------
    def _mul(self, a, b):
        if a == 0 or b == 0:
            return 0
        return int(self.exp[(self.log[a] + self.log[b]) % 255])

    def _inv(self, a):
        return int(self.exp[(255 - self.log[a]) % 255])

    def _pow_a(self, e):
        return int(self.exp[e % 255])

    def _poly_mul(self, p, q):
        r = [0] * (len(p) + len(q) - 1)
        for i, a in enumerate(p):
            for j, b in enumerate(q):
                r[i + j] ^= self._mul(a, b)
        return r

    def _poly_eval(self, p, x):
        y = 0
        for c in p:
            y = self._mul(y, x) ^ int(c)
        return y

    # -- codec ----------------------------------------------------------
    def encode(self, data: bytes) -> bytes:
        assert len(data) == 255 - self.nroots
        rem = [0] * self.nroots
        for b in data:
            factor = b ^ rem[0]
            rem = rem[1:] + [0]
            if factor:
                for i in range(self.nroots):
                    rem[i] ^= self._mul(self.gen[i + 1], factor)
        return bytes(data) + bytes(rem)

    def decode(self, block: bytes) -> Optional[bytes]:
        msg = list(block)
        n = len(msg)
        assert n == 255
        synd = [self._poly_eval(msg, self._pow_a(self.fcr + i * self.gap))
                for i in range(self.nroots)]
        if max(synd) == 0:
            return bytes(block[:-self.nroots])

        # Berlekamp-Massey over Z (coefficients highest-order first)
        err_loc, old_loc = [1], [1]
        for i in range(self.nroots):
            old_loc.append(0)
            delta = synd[i]
            for j in range(1, len(err_loc)):
                delta ^= self._mul(err_loc[-(j + 1)], synd[i - j])
            if delta != 0:
                if len(old_loc) > len(err_loc):
                    new_loc = [self._mul(c, delta) for c in old_loc]
                    old_loc = [self._mul(c, self._inv(delta))
                               for c in err_loc]
                    err_loc = new_loc
                scaled = [self._mul(c, delta) for c in old_loc]
                r = [0] * max(len(err_loc), len(scaled))
                r[len(r) - len(err_loc):] = err_loc
                for k, c in enumerate(scaled):
                    r[k + len(r) - len(scaled)] ^= c
                err_loc = r
        while err_loc and err_loc[0] == 0:
            err_loc.pop(0)
        n_err = len(err_loc) - 1
        if n_err * 2 > self.nroots:
            return None

        # Chien search over Z = X^gap: codeword position p (0 = first
        # byte) has X = α^(n-1-p), Z = X^gap.
        Z, pos = [], []
        for p in range(n):
            xp = (n - 1 - p) % 255
            z = self._pow_a(xp * self.gap)
            if self._poly_eval(err_loc, self._inv(z)) == 0:
                Z.append(z)
                pos.append(p)
        if len(pos) != n_err:
            return None

        # Forney over Z (roots at Z_k⁻¹): Ω(x) = S(x)·Λ(x) mod x^n_err
        def conv_low(p, q):
            r = [0] * (len(p) + len(q) - 1)
            for a, pa in enumerate(p):
                for b, qb in enumerate(q):
                    r[a + b] ^= self._mul(pa, qb)
            return r

        eloc_low = [1]
        for z in Z:
            eloc_low = conv_low(eloc_low, [1, z])
        omega_low = conv_low(synd, eloc_low)[:n_err]

        def eval_low(p, y):
            acc, yp = 0, 1
            for c in p:
                acc ^= self._mul(c, yp)
                yp = self._mul(yp, y)
            return acc

        out = list(msg)
        for k, p in enumerate(pos):
            zk_inv = self._inv(Z[k])
            prod = 1
            for j in range(len(Z)):
                if j != k:
                    prod = self._mul(prod, 1 ^ self._mul(Z[j], zk_inv))
            if prod == 0:
                return None
            Yk = self._mul(eval_low(omega_low, zk_inv),
                           self._inv(prod))
            # e = Y / X^fcr with X = α^(n-1-p)
            xp = (n - 1 - p) % 255
            e = self._mul(Yk, self._inv(self._pow_a(xp * self.fcr)))
            out[p] ^= e
        synd2 = [self._poly_eval(out,
                                 self._pow_a(self.fcr + i * self.gap))
                 for i in range(self.nroots)]
        if max(synd2) != 0:
            return None
        return bytes(out[:-self.nroots])


def ccsds_randomizer(n: int = 255) -> np.ndarray:
    """CCSDS 131.0-B pseudo-randomizer bytes (x⁸+x⁷+x⁵+x³+1, all-ones
    seed) — reference falcon_fec.h randVals regenerated from the spec."""
    bits = [1] * 8
    for i in range(n * 8):
        bits.append(bits[i] ^ bits[i + 3] ^ bits[i + 5] ^ bits[i + 7])
    return np.array([int("".join(map(str, bits[i * 8:(i + 1) * 8])), 2)
                     for i in range(n)], np.uint8)


# CCSDS dual-basis (Berlekamp) transform: a GF(2)-linear map, generated
# from its 8 basis images (reference falcon_fec.h toDB/fromDB tables are
# exactly this map and its inverse).
_DUAL_BASIS_IMAGES = (0x7B, 0xAF, 0x99, 0xFA, 0x86, 0xEC, 0xEF, 0x8D)


def _dual_tables():
    to_db = np.zeros(256, np.uint8)
    for x in range(256):
        v = 0
        for k in range(8):
            if x & (1 << k):
                v ^= _DUAL_BASIS_IMAGES[k]
        to_db[x] = v
    from_db = np.zeros(256, np.uint8)
    from_db[to_db] = np.arange(256, dtype=np.uint8)
    return to_db, from_db


TO_DUAL_BASIS, FROM_DUAL_BASIS = _dual_tables()
