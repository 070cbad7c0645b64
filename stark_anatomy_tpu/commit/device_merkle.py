"""Device-resident Merkle commitment: hash codewords WHERE THEY LIVE.

Motivation (measured, round 3): device->host transfer through this
environment's TPU tunnel runs at ~16 MB/s, so shipping a 512 MB codeword
to the host for hashing costs ~30 s while the hash itself costs
milliseconds of device compute.  The commitment scheme (blake2s-256 over
16-byte little-endian elements, commit/hashing.py) was chosen so the
whole tree builds from native uint32 vector ops: leaf messages pack the
canonical 16-bit limbs into u32 words, every hash is ONE blake2s
compression (paired leaf = 32-byte message, node = 64-byte), and tree
levels reduce on device.  Only 32-byte roots and queried nodes/values
ever cross to the host.

Bit-exact with hashlib.blake2s and the C++ batch hasher
(native/blake2b.cpp) — tested in tests/test_device_merkle.py.

The reference hashes on the host through Python hashlib one call at a
time (merkle.py:6-27); SURVEY.md §7 hard-part 5 flagged exactly this
host<->device trade-off.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_IV = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _compress_words(m: List[jnp.ndarray], t: int) -> List[jnp.ndarray]:
    """One final blake2s-256 compression over 16 message-word arrays
    (each (..., n) uint32), t = message byte length <= 64.  Returns the 8
    digest-word arrays.

    TPU lowering: the 10 rounds are UNROLLED (~1100 elementwise ops) so
    XLA fuses the whole compression into a handful of passes over the
    lanes — the scan form materialized the full (16, n) message + state
    per round (~10x the HBM traffic; measured as an 18 s randomizer
    phase at 2^22 elements before round 4).  CPU keeps the scan form:
    XLA:CPU compile time explodes on the unrolled graph (the same
    pathology field/ops.py's compact mont_mul dodges)."""
    shape = jnp.broadcast_shapes(*[x.shape for x in m])
    h_words = [np.uint32(int(w)) for w in _IV]
    h_words[0] = h_words[0] ^ np.uint32(0x01010020)  # digest len 32, fanout/depth 1
    v_init = list(h_words) + [np.uint32(int(w)) for w in _IV]
    v_init[12] = v_init[12] ^ np.uint32(t)
    v_init[14] = ~v_init[14]

    unroll = jax.default_backend() in ("tpu", "axon")
    if unroll:
        mb = [jnp.broadcast_to(x, shape) for x in m]
        v = [jnp.broadcast_to(jnp.uint32(int(w)), shape) for w in v_init]

        def G(a, b, c, d, x, y):
            v[a] = v[a] + v[b] + x
            v[d] = _rotr(v[d] ^ v[a], 16)
            v[c] = v[c] + v[d]
            v[b] = _rotr(v[b] ^ v[c], 12)
            v[a] = v[a] + v[b] + y
            v[d] = _rotr(v[d] ^ v[a], 8)
            v[c] = v[c] + v[d]
            v[b] = _rotr(v[b] ^ v[c], 7)

        for s in _SIGMA:
            G(0, 4, 8, 12, mb[s[0]], mb[s[1]])
            G(1, 5, 9, 13, mb[s[2]], mb[s[3]])
            G(2, 6, 10, 14, mb[s[4]], mb[s[5]])
            G(3, 7, 11, 15, mb[s[6]], mb[s[7]])
            G(0, 5, 10, 15, mb[s[8]], mb[s[9]])
            G(1, 6, 11, 12, mb[s[10]], mb[s[11]])
            G(2, 7, 8, 13, mb[s[12]], mb[s[13]])
            G(3, 4, 9, 14, mb[s[14]], mb[s[15]])
        return [h_words[i] ^ v[i] ^ v[i + 8] for i in range(8)]

    ms = jnp.stack([jnp.broadcast_to(x, shape) for x in m])     # (16, ..., n)
    v0 = jnp.stack([jnp.broadcast_to(jnp.uint32(int(w)), shape) for w in v_init])
    sigma = jnp.asarray(np.array(_SIGMA, dtype=np.int32))       # (10, 16)

    def round_fn(vt, s):
        mm = jnp.take(ms, s, axis=0)                            # permuted words
        v = [vt[i] for i in range(16)]

        def G(a, b, c, d, x, y):
            v[a] = v[a] + v[b] + x
            v[d] = _rotr(v[d] ^ v[a], 16)
            v[c] = v[c] + v[d]
            v[b] = _rotr(v[b] ^ v[c], 12)
            v[a] = v[a] + v[b] + y
            v[d] = _rotr(v[d] ^ v[a], 8)
            v[c] = v[c] + v[d]
            v[b] = _rotr(v[b] ^ v[c], 7)

        G(0, 4, 8, 12, mm[0], mm[1])
        G(1, 5, 9, 13, mm[2], mm[3])
        G(2, 6, 10, 14, mm[4], mm[5])
        G(3, 7, 11, 15, mm[6], mm[7])
        G(0, 5, 10, 15, mm[8], mm[9])
        G(1, 6, 11, 12, mm[10], mm[11])
        G(2, 7, 8, 13, mm[12], mm[13])
        G(3, 4, 9, 14, mm[14], mm[15])
        return jnp.stack(v), None

    v, _ = jax.lax.scan(round_fn, v0, sigma)
    return [h_words[i] ^ v[i] ^ v[i + 8] for i in range(8)]


def _pack_words(canon: jnp.ndarray) -> jnp.ndarray:
    """Canonical limb-first (8, n) u32 (16-bit limbs) -> (4, n) u32 words
    of the 16-byte little-endian element encoding."""
    return canon[0::2] | (canon[1::2] << np.uint32(16))


@jax.jit
def _paired_leaf_digests(canon: jnp.ndarray) -> jnp.ndarray:
    """(8, n) canonical limbs -> (8, n/2) u32 digest words of the paired
    leaves H(LE16(c[i]) || LE16(c[i+n/2]))."""
    n = canon.shape[-1]
    w = _pack_words(canon)                                 # (4, n)
    lo, hi = w[:, : n // 2], w[:, n // 2 :]
    zero = jnp.zeros_like(lo[0])
    m = [lo[k] for k in range(4)] + [hi[k] for k in range(4)] + [zero] * 8
    return jnp.stack(_compress_words(m, 32))


@jax.jit
def _node_level(digests: jnp.ndarray) -> jnp.ndarray:
    """(8, n) digest words -> (8, n/2) parent digest words
    H(left || right) over 64-byte messages."""
    left, right = digests[:, 0::2], digests[:, 1::2]
    m = [left[k] for k in range(8)] + [right[k] for k in range(8)]
    return jnp.stack(_compress_words(m, 64))


def _parent_level(d: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, w) digest words -> (..., 8, w/2) parents."""
    left, right = d[..., 0::2], d[..., 1::2]
    m = [left[..., k, :] for k in range(8)] + [right[..., k, :] for k in range(8)]
    return jnp.stack(_compress_words(m, 64), axis=-2)


# levels unrolled in the traced graph before switching to the padded scan
_TREE_UNROLL = 2


def _flat_tree_core(leaf_digests: jnp.ndarray) -> jnp.ndarray:
    """All tree levels, leaf level first, concatenated: (..., 8, 2n-1).

    Traced once per leaf count; running every level inside ONE executable
    matters because each separate level call pays ~25 ms of tunnel
    dispatch latency — ~0.5 s per commitment at 2^22 leaves (round-3
    'fixed dispatch cost').  The top _TREE_UNROLL levels (the bulk of
    the work) are unrolled; the remaining ~20 small levels run as a
    lax.scan over a FIXED-width buffer — an unrolled compression per
    level made every tree/FRI-round graph ~26K traced ops, which put
    minutes of per-process tracing + compilation into time-to-first-proof
    (round-4 ask 4).  The scan wastes compute on pad lanes past each
    level's true width (~n/4 extra compressions total, ~10 ms at 2^23).
    Supports leading batch axes.  Bit-exact with the host tree
    (tests/test_device_merkle.py).
    """
    levels = [leaf_digests]
    for _ in range(_TREE_UNROLL):
        if levels[-1].shape[-1] > 1:
            levels.append(_parent_level(levels[-1]))
    w = levels[-1].shape[-1]
    if w > 1:
        iters = w.bit_length() - 1

        def body(state, _):
            parents = _parent_level(state)          # (..., 8, w/2)
            # keep the buffer width fixed: parents occupy the FIRST half,
            # the second half is pad the next iteration never reads
            return jnp.concatenate([parents, parents], axis=-1), parents

        _, ys = jax.lax.scan(body, levels[-1], None, length=iters)
        for j in range(iters):
            levels.append(ys[j][..., : w >> (j + 1)])
    # trailing zero pad column: the natural concatenated width 2n-1 is
    # ODD, and XLA compiles index gathers on odd-width arrays
    # pathologically (63 s for one multiproof gather shape at 2^18-1,
    # measured round 5); one pad lane makes every downstream gather cheap
    levels.append(jnp.zeros_like(levels[-1][..., :1]))
    return jnp.concatenate(levels, axis=-1)


_flat_tree_jit = jax.jit(_flat_tree_core)


def _digest_col_bytes(col: np.ndarray) -> bytes:
    """One (8,) u32 digest-word column -> the 32 digest bytes."""
    return col.astype("<u4").tobytes()


def _take_padded(arr: jnp.ndarray, idx: Sequence[int]) -> np.ndarray:
    """Gather columns ``idx`` from a device (8, n) array, with the index
    count PADDED to the next power of two (duplicating the last index)
    before the gather: opening index sets vary in size per proof, and
    every distinct gather size is a fresh XLA compile — padding keeps the
    executable cache to log2(n) shapes.  An empty index list returns an
    empty result (matching the host MerkleTree.open on depth-0 trees)."""
    k = len(idx)
    if k == 0:
        return np.empty(arr.shape[:-1] + (0,), dtype=arr.dtype)
    padded = 1 << max(k - 1, 0).bit_length()
    idx = list(idx) + [idx[-1]] * (padded - k)
    out = np.asarray(jax.device_get(jnp.take(arr, jnp.asarray(idx), axis=-1)))
    return out[..., :k]


class DeviceMerkleTree:
    """Merkle tree whose levels live ON DEVICE, stored CONCATENATED as one
    (8, 2n-1) u32 digest-word array.  Bit-identical roots/paths to the
    host MerkleTree over the same leaves; an opening is ONE device gather
    over the flat array — per-level gathers would pay the device tunnel's
    ~25 ms eager-dispatch latency log2(n) times per proof."""

    __slots__ = ("flat", "offsets", "depth", "_root", "_n_leaves")

    def __init__(self, leaf_digests: jnp.ndarray = None, flat: jnp.ndarray = None,
                 root: bytes = None, n_leaves: int = None):
        """Build from (8, n) leaf digests (ONE jitted call for all levels),
        or wrap a precomputed ``flat`` (8, 2n-1) level array — the fused
        fold+commit path computes trees inside a larger executable.

        ``n_leaves``: the LOGICAL leaf count when ``flat`` was produced in
        a fixed-width padded buffer (the shape-family FRI kernel,
        protocols/fri.py:_fold_commit_padded): physical level widths are
        [pad, pad/2, ..., 1] but only the first n_leaves/2^l entries of
        level l are real; the true root sits at the START of physical
        level log2(n_leaves), not at the end of the array."""
        if flat is None:
            flat = _flat_tree_jit(leaf_digests)
        pad = (flat.shape[-1] + 1) // 2
        n = pad if n_leaves is None else n_leaves
        assert n <= pad
        self._n_leaves = n
        self.depth = max(n.bit_length() - 1, 0)
        self.offsets = [0]
        size = pad
        while True:
            self.offsets.append(self.offsets[-1] + size)
            if size == 1:
                break
            size //= 2
        self.flat = flat
        if root is None:
            col = self.offsets[self.depth]
            root = _digest_col_bytes(
                np.asarray(jax.device_get(self.flat[:, col : col + 1]))[:, 0]
            )
        self._root = root

    @property
    def levels(self) -> List[jnp.ndarray]:
        """Per-level views into the flat digest array (testing/debug) —
        LOGICAL widths (pad lanes of a padded tree excluded)."""
        return [
            self.flat[
                :,
                self.offsets[k] : self.offsets[k] + max(self._n_leaves >> k, 1),
            ]
            for k in range(self.depth + 1)
        ]

    @property
    def root(self) -> bytes:
        return self._root

    def __len__(self) -> int:
        return self._n_leaves

    def _gather_flat(self, flat_idx: Sequence[int]) -> List[bytes]:
        cols = _take_padded(self.flat, list(flat_idx))
        return [_digest_col_bytes(cols[:, j]) for j in range(cols.shape[-1])]

    def open(self, index: int) -> List[bytes]:
        """Authentication path (sibling digests, leaf level first)."""
        assert 0 <= index < len(self)
        flat_idx = []
        for lvl in range(self.depth):
            flat_idx.append(self.offsets[lvl] + (index ^ 1))
            index >>= 1
        return self._gather_flat(flat_idx)

    def multiproof(self, indices) -> List[bytes]:
        """Minimal batched authentication proof; byte-identical to
        commit.merkle.open_multi over the host tree (same canonical
        sibling order), with ONE device gather for the whole proof."""
        known = sorted(set(indices))
        flat_idx: List[int] = []
        for lvl in range(self.depth):
            known_set = set(known)
            flat_idx.extend(
                self.offsets[lvl] + (i ^ 1)
                for i in known
                if i ^ 1 not in known_set
            )
            known = sorted({i >> 1 for i in known})
        if not flat_idx:
            return []
        return self._gather_flat(flat_idx)


class DeviceRows:
    """Opening-value accessor over a DEVICE canonical codeword stored as
    PACKED little-endian u32 words (4, n) — 16 bytes/element, the exact
    information content (the sparse (8, n) 16-bit-limb layout pinned 2x
    the HBM: 512 MB extra per retained codeword at a 2^24 domain).
    Queried values are gathered on device and decoded host-side — the
    bulk codeword never transfers."""

    __slots__ = ("canon", "_length")

    def __init__(self, canon: jnp.ndarray, length: int = None):
        self.canon = canon                           # (4, n) packed LE words
        # logical length: the padded-buffer FRI kernel produces canon
        # arrays whose tail lanes are pad garbage the protocol never reads
        self._length = canon.shape[-1] if length is None else length

    @property
    def shape(self):
        return (self._length, self.canon.shape[0])

    def __len__(self) -> int:
        return self._length

    def gather(self, indices) -> List[int]:
        """Canonical ints at ``indices`` (one device gather)."""
        cols = _take_padded(self.canon, list(indices))      # (4, k)
        le = np.ascontiguousarray(cols.T).astype("<u4")     # (k, 4) u32
        return [
            int.from_bytes(le[j].tobytes(), "little") for j in range(le.shape[0])
        ]

    def __getitem__(self, i: int):
        # single-element fallback (slow path; bulk callers use gather)
        return self.gather([i])[0]


# below this many codeword elements the host path wins: device commitment
# costs a fixed ~0.3 s of per-dispatch tunnel latency (leaf kernel +
# log n level kernels + root fetch), while transferring a small codeword
# costs n * 32 B at ~16 MB/s — the curves cross around 2^17..2^18
DEVICE_COMMIT_MIN = 1 << 18


def use_device_commit(n: Optional[int] = None) -> bool:
    """Commit on device when the codeword lives across a slow transfer
    boundary (TPU backends) AND is large enough that transfer cost beats
    the device path's fixed dispatch latency.  On CPU the 'device' is
    host memory, so the C++ batch hasher is the better tool; override
    with STARK_TPU_DEVICE_HASH=1/0 (size gate still applies unless
    forced on with n omitted)."""
    import os

    env = os.environ.get("STARK_TPU_DEVICE_HASH")
    if env == "0":
        return False
    if env == "1":
        return True if n is None else n >= int(
            os.environ.get("STARK_TPU_DEVICE_HASH_MIN", 0)
        )
    if env is not None:
        import warnings

        warnings.warn(
            f"STARK_TPU_DEVICE_HASH={env!r} is not '0' or '1'; ignoring "
            "and using backend autodetection"
        )
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
    return on_tpu and (n is None or n >= DEVICE_COMMIT_MIN)


@jax.jit
def _commit_paired_core(codeword_mont: jnp.ndarray):
    """(..., 8, n) Montgomery -> (PACKED canonical words (..., 4, n), flat
    tree) in ONE executable (supports batch axes)."""
    from ..field import ops as F

    canon = F.from_mont(codeword_mont)
    n = canon.shape[-1]
    w = canon[..., 0::2, :] | (canon[..., 1::2, :] << np.uint32(16))
    lo, hi = w[..., : n // 2], w[..., n // 2 :]
    zero = jnp.zeros_like(lo[..., 0, :])
    m = (
        [lo[..., k, :] for k in range(4)]
        + [hi[..., k, :] for k in range(4)]
        + [zero] * 8
    )
    leaves = jnp.stack(_compress_words(m, 32), axis=-2)
    return w, _flat_tree_core(leaves)


def _commit_paired_dynamic(codeword_mont: jnp.ndarray, half: jnp.ndarray):
    """(8, W)-buffer commit with DYNAMIC logical length h: pairs leaf i
    with element i + h/2 where only the first h lanes are real; pad lanes
    produce garbage digests the host never reads.  Traced inside the
    shape-family FRI kernel (protocols/fri.py:_fold_commit_padded) so ONE
    executable serves several fold rounds."""
    from ..field import ops as F

    canon = F.from_mont(codeword_mont)
    W = canon.shape[-1]
    w = canon[..., 0::2, :] | (canon[..., 1::2, :] << np.uint32(16))   # (4, W)
    lo = w[..., : W // 2]
    hi = jax.lax.dynamic_slice_in_dim(
        w, (half >> 1).astype(jnp.int32), W // 2, axis=-1
    )
    zero = jnp.zeros_like(lo[..., 0, :])
    m = (
        [lo[..., k, :] for k in range(4)]
        + [hi[..., k, :] for k in range(4)]
        + [zero] * 8
    )
    leaves = jnp.stack(_compress_words(m, 32), axis=-2)
    return w, _flat_tree_core(leaves)


def device_commit_paired(codeword_mont: jnp.ndarray):
    """Commit a device Montgomery codeword (8, n) with paired leaves,
    entirely on device: ONE dispatch + one 32-byte root fetch.
    Returns (DeviceRows, DeviceMerkleTree)."""
    canon, flat = _commit_paired_core(codeword_mont)
    return DeviceRows(canon), DeviceMerkleTree(flat=flat)


def device_commit_paired_many(codewords_mont: jnp.ndarray):
    """Commit R stacked codewords (R, 8, n): ONE dispatch builds every
    canonical array and tree, ONE fetch brings back all R roots.
    Returns a list of (DeviceRows, DeviceMerkleTree)."""
    canon, flat = _commit_paired_core(codewords_mont)
    roots = np.asarray(jax.device_get(flat[..., -2]))       # (R, 8); -1 is pad
    return [
        (
            DeviceRows(canon[r]),
            DeviceMerkleTree(flat=flat[r], root=_digest_col_bytes(roots[r])),
        )
        for r in range(codewords_mont.shape[0])
    ]


def gather_rows(rows, indices) -> List[int]:
    """Canonical ints of ``rows`` at ``indices`` for any accessor kind:
    DeviceRows (device gather), ShardedRows/numpy (host rows), or a plain
    list of ints (host FRI tail layers)."""
    if hasattr(rows, "gather"):
        return rows.gather(indices)
    if isinstance(rows, list):
        return [rows[i] for i in indices]
    from ..utils.convert import int_from_row

    return [int_from_row(rows[i]) for i in indices]
