"""Pure-Python reader for Pixar's USDC ("crate") binary format, v0.8.x.

The reference ships its composed construction site as a 3.4 MB crate
(`cad_models/world2.usd.backup` — the only non-LFS-stub scene binary in the
repo). Isaac Sim / pxr is not available in this image, so this module
implements the subset of the crate format needed to mine that file for
ground truth: prim tree, prim types, xformOps, mesh points/extents, and
reference/payload asset paths. scene/assets.py's proxy dimensions and
sample/placement.py's layout are calibrated against it
(tools/calibrate_proxies.py; results in PARITY.md).

Format notes (pxr/usd/usd/crateFile.cpp, v0.8):
  bootstrap: 8B ident "PXR-USDC", 8B version, u64 TOC offset
  TOC: u64 count, then {16B name, u64 start, u64 size} sections
  TOKENS: u64 n, u64 uncompressedSize, u64 compressedSize, lz4 blob of
          NUL-separated strings
  STRINGS: u64 n, u32 token-index per string
  FIELDS: u64 n, compressed-u32 token indexes, u64 repsSize, lz4 blob of
          u64 ValueReps
  FIELDSETS: u64 n, compressed-u32 flat field-index runs, 0xFFFFFFFF
          terminated; specs store the flat OFFSET of their run
  PATHS: u64 numPaths, u64 numEncoded, 3 compressed-int streams
          (pathIndexes, elementTokenIndexes [negative = property], jumps)
  SPECS: 3 compressed-u32 streams (pathIndex, fieldSetOffset, specType)

"Compressed ints" = LZ4 (chunked TfFastCompression framing: leading chunk
count byte, 0 = single chunk) over [commonDelta(int width)][2-bit codes]
[per-code payload bytes]; values are running sums of deltas.

ValueRep u64: bit63 = array, bit62 = inlined, bit61 = compressed,
bits48..55 = type enum, bits0..47 = payload (inline value or file offset).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# crateDataTypes.h enum (subset), verified empirically against the
# reference crate's typeName tokens (matrices at 13-15, quats 16-18,
# vec2/3/4 at 19-30).
TYPE_BOOL = 1
TYPE_INT = 3
TYPE_UINT = 4
TYPE_INT64 = 5
TYPE_UINT64 = 6
TYPE_HALF = 7
TYPE_FLOAT = 8
TYPE_DOUBLE = 9
TYPE_STRING = 10
TYPE_TOKEN = 11
TYPE_ASSET_PATH = 12
TYPE_MATRIX2D, TYPE_MATRIX3D, TYPE_MATRIX4D = 13, 14, 15
TYPE_QUATD = 16
TYPE_QUATF = 17
TYPE_QUATH = 18
TYPE_VEC2D, TYPE_VEC2F, TYPE_VEC2H, TYPE_VEC2I = 19, 20, 21, 22
TYPE_VEC3D, TYPE_VEC3F, TYPE_VEC3H, TYPE_VEC3I = 23, 24, 25, 26
TYPE_VEC4D, TYPE_VEC4F, TYPE_VEC4H, TYPE_VEC4I = 27, 28, 29, 30
TYPE_DICTIONARY = 31
TYPE_TOKEN_LIST_OP = 32
TYPE_PATH_LIST_OP = 34
TYPE_REFERENCE_LIST_OP = 35
TYPE_TOKEN_VECTOR = 41
TYPE_SPECIFIER = 42
TYPE_PAYLOAD = 47
TYPE_PAYLOAD_LIST_OP = 55

SPEC_TYPE_ATTRIBUTE = 1
SPEC_TYPE_PRIM = 6
SPEC_TYPE_PSEUDO_ROOT = 7
SPEC_TYPE_RELATIONSHIP = 8

_VEC_SIZE = {TYPE_VEC2D: 2, TYPE_VEC2F: 2, TYPE_VEC2I: 2,
             TYPE_VEC3D: 3, TYPE_VEC3F: 3, TYPE_VEC3I: 3,
             TYPE_VEC4D: 4, TYPE_VEC4F: 4, TYPE_VEC4I: 4,
             TYPE_QUATD: 4, TYPE_QUATF: 4}
_ELEM_FMT = {TYPE_VEC2D: 'd', TYPE_VEC2F: 'f', TYPE_VEC2I: 'i',
             TYPE_VEC3D: 'd', TYPE_VEC3F: 'f', TYPE_VEC3I: 'i',
             TYPE_VEC4D: 'd', TYPE_VEC4F: 'f', TYPE_VEC4I: 'i',
             TYPE_QUATD: 'd', TYPE_QUATF: 'f',
             TYPE_FLOAT: 'f', TYPE_DOUBLE: 'd', TYPE_INT: 'i',
             TYPE_UINT: 'I', TYPE_INT64: 'q', TYPE_UINT64: 'Q'}


def lz4_block_decompress(src: bytes) -> bytes:
    """Raw LZ4 block decode (no frame)."""
    dst = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]; i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]; i += 1; lit += b
                if b != 255:
                    break
        dst += src[i:i + lit]
        i += lit
        if i >= n:
            break
        offset = src[i] | (src[i + 1] << 8); i += 2
        ml = token & 0xF
        if ml == 15:
            while True:
                b = src[i]; i += 1; ml += b
                if b != 255:
                    break
        ml += 4
        start = len(dst) - offset
        if offset >= ml:  # non-overlapping: slice copy
            dst += dst[start:start + ml]
        else:
            for j in range(ml):
                dst.append(dst[start + j])
    return bytes(dst)


def tf_decompress(src: bytes) -> bytes:
    """TfFastCompression framing: leading chunk-count byte (0 = one chunk),
    multi-chunk = int32 size prefix per chunk."""
    nchunks = src[0]
    if nchunks == 0:
        return lz4_block_decompress(src[1:])
    out = bytearray()
    p = 1
    for _ in range(nchunks):
        sz, = struct.unpack_from('<i', src, p); p += 4
        out += lz4_block_decompress(src[p:p + sz])
        p += sz
    return bytes(out)


def decode_integers(buf: bytes, n: int, width: int = 4) -> List[int]:
    """Usd_IntegerCompression payload (post-LZ4): running-sum deltas with
    2-bit codes (0=common, 1=int8, 2=int16, 3=int{width*8})."""
    common = int.from_bytes(buf[:width], 'little', signed=True)
    codes_len = (n * 2 + 7) // 8
    codes = buf[width:width + codes_len]
    p = width + codes_len
    out = []
    prev = 0
    for i in range(n):
        c = (codes[i >> 2] >> ((i & 3) * 2)) & 3
        if c == 0:
            d = common
        elif c == 1:
            d = int.from_bytes(buf[p:p + 1], 'little', signed=True); p += 1
        elif c == 2:
            d = int.from_bytes(buf[p:p + 2], 'little', signed=True); p += 2
        else:
            d = int.from_bytes(buf[p:p + width], 'little', signed=True)
            p += width
        prev += d
        out.append(prev)
    return out


class CrateFile:
    """Random-access reader over one crate layer."""

    def __init__(self, data: bytes):
        assert data[:8] == b"PXR-USDC", "not a USDC crate"
        self.version = tuple(data[8:11])
        assert self.version[0] == 0 and self.version[1] >= 7, (
            f"unsupported crate version {self.version}")
        self.data = data
        toc_off, = struct.unpack_from('<Q', data, 16)
        nsec, = struct.unpack_from('<Q', data, toc_off)
        self.sections: Dict[str, Tuple[int, int]] = {}
        off = toc_off + 8
        for _ in range(nsec):
            name = data[off:off + 16].rstrip(b'\0').decode()
            start, size = struct.unpack_from('<QQ', data, off + 16)
            self.sections[name] = (start, size)
            off += 32
        self._read_tokens()
        self._read_strings()
        self._read_fields()
        self._read_fieldsets()
        self._read_paths()
        self._read_specs()

    @classmethod
    def from_file(cls, path: str) -> "CrateFile":
        with open(path, 'rb') as f:
            return cls(f.read())

    # -- sections -----------------------------------------------------------
    def _read_compressed_ints(self, pos: int, n: int,
                              width: int = 4) -> Tuple[List[int], int]:
        csz, = struct.unpack_from('<Q', self.data, pos)
        buf = tf_decompress(self.data[pos + 8:pos + 8 + csz])
        return decode_integers(buf, n, width), pos + 8 + csz

    def _read_tokens(self) -> None:
        start, _ = self.sections['TOKENS']
        ntok, usz, csz = struct.unpack_from('<QQQ', self.data, start)
        blob = tf_decompress(self.data[start + 24:start + 24 + csz])
        assert len(blob) == usz
        self.tokens = [t.decode('utf-8', 'replace')
                       for t in blob.split(b'\0')[:ntok]]

    def _read_strings(self) -> None:
        start, _ = self.sections['STRINGS']
        n, = struct.unpack_from('<Q', self.data, start)
        idx = struct.unpack_from(f'<{n}I', self.data, start + 8)
        self.strings = [self.tokens[i] for i in idx]

    def _read_fields(self) -> None:
        start, _ = self.sections['FIELDS']
        n, = struct.unpack_from('<Q', self.data, start)
        tok_idx, p = self._read_compressed_ints(start + 8, n)
        repsz, = struct.unpack_from('<Q', self.data, p)
        blob = tf_decompress(self.data[p + 8:p + 8 + repsz])
        reps = struct.unpack_from(f'<{n}Q', blob)
        self.fields = [(self.tokens[tok_idx[i]], reps[i]) for i in range(n)]

    def _read_fieldsets(self) -> None:
        start, _ = self.sections['FIELDSETS']
        n, = struct.unpack_from('<Q', self.data, start)
        flat, _ = self._read_compressed_ints(start + 8, n)
        self._fieldsets_flat = flat

    def _fieldset_at(self, off: int) -> List[int]:
        """Specs store the flat OFFSET of their 0xFFFFFFFF-terminated run."""
        out = []
        flat = self._fieldsets_flat
        while off < len(flat) and flat[off] != -1 and flat[off] != 0xFFFFFFFF:
            out.append(flat[off])
            off += 1
        return out

    def _read_paths(self) -> None:
        start, _ = self.sections['PATHS']
        _npaths, nenc = struct.unpack_from('<QQ', self.data, start)
        p = start + 16
        path_idx, p = self._read_compressed_ints(p, nenc)
        elem_tok, p = self._read_compressed_ints(p, nenc)
        jumps, p = self._read_compressed_ints(p, nenc)
        paths: Dict[int, str] = {}
        # Iterative version of crateFile's _BuildDecompressedPathsImpl:
        # stack of (stream index, parent path string).
        stack = [(0, None)]
        while stack:
            cur, parent = stack.pop()
            while cur < nenc:
                this_idx = path_idx[cur]
                if parent is None:
                    paths[this_idx] = "/"
                    me = "/"
                else:
                    et = elem_tok[cur]
                    tok = self.tokens[abs(et)]
                    if et < 0:  # property path
                        me = parent + "." + tok
                    else:
                        me = (parent + "/" + tok) if parent != "/" else "/" + tok
                    paths[this_idx] = me
                j = jumps[cur]
                has_child = j > 0 or j == -1
                has_sibling = j >= 0
                if has_child:
                    if has_sibling:
                        stack.append((cur + j, parent))
                    parent = me
                    cur += 1
                elif has_sibling:
                    cur += 1
                else:
                    break
        self.paths = paths

    def _read_specs(self) -> None:
        start, _ = self.sections['SPECS']
        n, = struct.unpack_from('<Q', self.data, start)
        sp_path, p = self._read_compressed_ints(start + 8, n)
        sp_fset, p = self._read_compressed_ints(p, n)
        sp_type, p = self._read_compressed_ints(p, n)
        self.specs: Dict[str, Tuple[int, Dict[str, int]]] = {}
        for i in range(n):
            path = self.paths.get(sp_path[i])
            fields = {self.fields[fi][0]: self.fields[fi][1]
                      for fi in self._fieldset_at(sp_fset[i])}
            self.specs[path] = (sp_type[i], fields)

    # -- values -------------------------------------------------------------
    def value(self, rep: int):
        """Decode a ValueRep to a Python/numpy value (supported subset)."""
        t = (rep >> 48) & 0xFF
        is_array = bool(rep >> 63 & 1)
        inlined = bool(rep >> 62 & 1)
        compressed = bool(rep >> 61 & 1)
        payload = rep & ((1 << 48) - 1)
        if inlined:
            return self._inline_value(t, payload)
        if is_array:
            return self._array_value(t, payload, compressed)
        return self._offset_value(t, payload)

    def _inline_value(self, t: int, payload: int):
        lo = payload & 0xFFFFFFFF
        if t in (TYPE_TOKEN, TYPE_ASSET_PATH):
            return self.tokens[lo]
        if t == TYPE_STRING:
            return self.strings[lo]
        if t in (TYPE_DOUBLE, TYPE_FLOAT):  # doubles inline as float bits
            return struct.unpack('<f', struct.pack('<I', lo))[0]
        if t in (TYPE_INT, TYPE_UINT, TYPE_INT64, TYPE_UINT64):
            return lo
        if t == TYPE_BOOL:
            return bool(lo)
        if t == TYPE_SPECIFIER:
            return ("def", "over", "class")[lo]
        if t in _VEC_SIZE:  # int8 components
            k = _VEC_SIZE[t]
            b = struct.pack('<I', lo)
            return np.frombuffer(b[:k], np.int8).astype(np.float64)
        if t in (TYPE_MATRIX2D, TYPE_MATRIX3D, TYPE_MATRIX4D):
            k = t - 11  # 13->2, 14->3, 15->4
            b = struct.pack('<I', lo)
            return np.diag(np.frombuffer(b[:k], np.int8).astype(np.float64))
        if t == TYPE_DICTIONARY and payload == 0:
            return {}
        return _Opaque(t, payload, True)

    def _array_value(self, t: int, off: int, compressed: bool):
        n, = struct.unpack_from('<Q', self.data, off)
        off += 8
        fmt = _ELEM_FMT.get(t)
        if fmt is None:
            return _Opaque(t, off, False)
        k = _VEC_SIZE.get(t, 1)
        if not compressed:
            flat = np.frombuffer(self.data, dtype='<' + fmt,
                                 count=n * k, offset=off)
            return flat.reshape(n, k) if k > 1 else flat.copy()
        # Compressed scalar int/float arrays (crate >= 0.6): ints are
        # integer-compressed; floats carry a code byte first.
        if t in (TYPE_INT, TYPE_UINT, TYPE_INT64, TYPE_UINT64):
            width = 8 if t in (TYPE_INT64, TYPE_UINT64) else 4
            vals, _ = self._read_compressed_ints(off, n * k, width)
            arr = np.asarray(vals, np.int64)
            return arr.reshape(n, k) if k > 1 else arr
        if t in (TYPE_FLOAT, TYPE_DOUBLE):
            code = self.data[off:off + 1]
            off += 1
            if code == b'i':  # stored as compressed int32s
                vals, _ = self._read_compressed_ints(off, n * k, 4)
                arr = np.asarray(vals, np.float64)
            elif code == b't':  # lookup table
                tsz, = struct.unpack_from('<I', self.data, off)
                off += 4
                esz = 4 if t == TYPE_FLOAT else 8
                table = np.frombuffer(self.data, dtype='<' + fmt,
                                      count=tsz, offset=off)
                off += tsz * esz
                idx, _ = self._read_compressed_ints(off, n * k, 4)
                arr = table[np.asarray(idx)]
            else:
                return _Opaque(t, off, False)
            return arr.reshape(n, k) if k > 1 else arr
        return _Opaque(t, off, False)

    def _offset_value(self, t: int, off: int):
        d = self.data
        if t in _VEC_SIZE:
            k = _VEC_SIZE[t]
            fmt = _ELEM_FMT[t]
            sz = struct.calcsize(fmt)
            return np.frombuffer(d, dtype='<' + fmt, count=k, offset=off).copy()
        if t == TYPE_MATRIX4D:
            return np.frombuffer(d, dtype='<d', count=16,
                                 offset=off).reshape(4, 4).copy()
        if t == TYPE_DOUBLE:
            return struct.unpack_from('<d', d, off)[0]
        if t == TYPE_TOKEN_VECTOR:
            n, = struct.unpack_from('<Q', d, off)
            idx = struct.unpack_from(f'<{n}I', d, off + 8)
            return [self.tokens[i] for i in idx]
        if t in (TYPE_REFERENCE_LIST_OP, TYPE_PAYLOAD_LIST_OP):
            return self._listop_asset_paths(t, off)
        return _Opaque(t, off, False)

    def _listop_asset_paths(self, t: int, off: int) -> List[str]:
        """Reference/Payload list op -> asset path strings (all sub-lists)."""
        d = self.data
        flags = d[off]
        off += 1
        # Item: u32 assetPath string idx, u32 primPath path idx,
        # 2 x f64 layerOffset, [references only: u64 customData size == 0].
        has_custom = t == TYPE_REFERENCE_LIST_OP
        out = []
        nlists = bin(flags >> 1).count("1")  # bit0 = isExplicit flag only
        for _ in range(nlists):
            n, = struct.unpack_from('<Q', d, off)
            off += 8
            for _ in range(n):
                sidx, _pidx = struct.unpack_from('<II', d, off)
                off += 8 + 16  # layer offset/scale doubles
                if has_custom:
                    ncust, = struct.unpack_from('<Q', d, off)
                    off += 8
                    if ncust:  # unsupported: bail with what we have
                        return out
                out.append(self.strings[sidx])
        return out

    # -- convenience --------------------------------------------------------
    def prims(self) -> Dict[str, Dict[str, object]]:
        """{prim_path: decoded fields} for every prim spec."""
        out = {}
        for path, (st, fields) in self.specs.items():
            if st == SPEC_TYPE_PRIM and path is not None:
                out[path] = {k: self.value(v) for k, v in fields.items()}
        return out

    def attr_default(self, prim_path: str, attr: str):
        """Decoded 'default' value of ``prim_path.attr``, or None."""
        spec = self.specs.get(f"{prim_path}.{attr}")
        if spec is None or "default" not in spec[1]:
            return None
        return self.value(spec[1]["default"])

    def local_transform(self, prim_path: str):
        """(translate (3,), quat wxyz or None, scale (3,)) from xformOps."""
        tr = self.attr_default(prim_path, "xformOp:translate")
        quat = self.attr_default(prim_path, "xformOp:orient")
        scale = self.attr_default(prim_path, "xformOp:scale")
        tr = np.zeros(3) if tr is None else np.asarray(tr, np.float64)
        scale = np.ones(3) if scale is None else np.asarray(scale, np.float64)
        if quat is not None:
            quat = np.asarray(quat, np.float64)
        return tr, quat, scale

    def mesh_aabb(self, prim_path: str) -> Optional[np.ndarray]:
        """(2, 3) local-space AABB from authored extent, else from points."""
        ext = self.attr_default(prim_path, "extent")
        if isinstance(ext, np.ndarray) and ext.shape == (2, 3):
            return ext.astype(np.float64)
        pts = self.attr_default(prim_path, "points")
        if isinstance(pts, np.ndarray) and pts.ndim == 2 and len(pts):
            return np.stack([pts.min(0), pts.max(0)]).astype(np.float64)
        return None


class _Opaque:
    """Placeholder for value types the reader does not decode."""

    def __init__(self, type_enum: int, payload: int, inlined: bool):
        self.type_enum = type_enum
        self.payload = payload
        self.inlined = inlined

    def __repr__(self) -> str:
        return f"<opaque type={self.type_enum} payload={self.payload}>"
