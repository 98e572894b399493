"""Byte-level HDF4 golden fixtures assembled INDEPENDENTLY of geo/hdf4.

VERDICT r2 item 5: geo/hdf4's reader was previously validated only by
round-trip against its own conforming writer — a bug mirrored in both would
be invisible. These fixtures are hand-assembled here with raw struct.pack
calls straight from the HDF 4.2 specification ("HDF Specification and
Developer's Guide": DD blocks §2, DFTAG_NDG/SDD/NT §5, Vgroup/Vdata §4,
special elements §10 — linked-block, whole-element deflate, chunked), so the
reader is exercised on byte layouts its writer cannot have influenced.

Covered: multi-DD-block chains, contiguous SDS, SPECIAL_LINKED with a
chained two-part block table, SPECIAL_COMP whole-element deflate,
SPECIAL_CHUNKED with per-chunk deflate + partial edge chunks, and a
StructMetadata.0 text attribute driving the HDF-EOS geotransform.
"""

import struct
import zlib

import numpy as np
import pytest

from sifsr_tpu.geo.hdf4 import HDF4File

# spec constants, restated here on purpose (do NOT import from geo.hdf4)
MAGIC = b"\x0e\x03\x13\x01"
DFTAG_NT = 106
DFTAG_SDD = 701
DFTAG_SD = 702
DFTAG_NDG = 720
DFTAG_VH = 1962
DFTAG_VS = 1963
DFTAG_VG = 1965
DFTAG_COMPRESSED = 40
DFTAG_LINKED = 20
EXT_BIT = 0x4000
SPECIAL_LINKED = 1
SPECIAL_COMP = 2
SPECIAL_CHUNKED = 6
COMP_DEFLATE = 4
DFNT_INT16 = 22
DFNT_UINT16 = 23


class Builder:
    """Assemble an HDF4 file from (tag, ref, payload) triples, laying the
    DD entries out over `dd_split` chained DD blocks."""

    def __init__(self):
        self.items = []  # (tag, ref, bytes or (offset_placeholder))

    def add(self, tag, ref, payload: bytes):
        self.items.append((tag, ref, payload))

    def build(self, dd_split: int = 1) -> bytes:
        n = len(self.items)
        per = -(-n // dd_split)
        groups = [self.items[i * per : (i + 1) * per] for i in range(dd_split)]
        groups = [g for g in groups if g]

        # compute layout: header blocks first, then payloads
        dd_sizes = [6 + 12 * len(g) for g in groups]
        data_off = 4 + sum(dd_sizes)
        offsets = {}
        off = data_off
        for tag, ref, payload in self.items:
            offsets[(tag, ref)] = off
            off += len(payload)

        out = bytearray(MAGIC)
        block_off = 4
        for gi, g in enumerate(groups):
            nxt = block_off + dd_sizes[gi] if gi + 1 < len(groups) else 0
            out += struct.pack(">hI", len(g), nxt)
            for tag, ref, payload in g:
                out += struct.pack(">HHII", tag, ref, offsets[(tag, ref)], len(payload))
            block_off += dd_sizes[gi]
        for tag, ref, payload in self.items:
            out += payload
        return bytes(out)


def vgroup(name: str, klass: str, members):
    tags = [t for t, _ in members]
    refs = [r for _, r in members]
    b = struct.pack(">H", len(members))
    b += struct.pack(f">{len(tags)}H", *tags)
    b += struct.pack(f">{len(refs)}H", *refs)
    b += struct.pack(">H", len(name)) + name.encode()
    b += struct.pack(">H", len(klass)) + klass.encode()
    # extension field + version (present in real files; reader must tolerate)
    b += struct.pack(">HH", 0, 3)
    return b


def ndg(members):
    return b"".join(struct.pack(">HH", t, r) for t, r in members)


def sdd(dims, nt_ref):
    b = struct.pack(">H", len(dims))
    b += struct.pack(f">{len(dims)}I", *dims)
    b += struct.pack(">HH", DFTAG_NT, nt_ref)
    # per-dim scale NT (tag, ref) pairs follow in real files
    for _ in dims:
        b += struct.pack(">HH", DFTAG_NT, nt_ref)
    return b


def nt(code):
    # version=1, type code, width bits, class (motorola byte order = 1)
    return bytes([1, code, 16, 1])


def vdata_header(name: str, fields, nvert: int):
    """fields: list of (fname, nt_code, isize_bytes, order)."""
    ivsize = sum(isize for _, _, isize, _ in fields)
    b = struct.pack(">hihh", 0, nvert, ivsize, len(fields))
    b += struct.pack(f">{len(fields)}h", *[f[1] for f in fields])
    b += struct.pack(f">{len(fields)}h", *[f[2] for f in fields])
    offs, o = [], 0
    for f in fields:
        offs.append(o)
        o += f[2]
    b += struct.pack(f">{len(fields)}h", *offs)
    b += struct.pack(f">{len(fields)}h", *[f[3] for f in fields])
    for f in fields:
        b += struct.pack(">h", len(f[0])) + f[0].encode()
    b += struct.pack(">h", len(name)) + name.encode()
    # namelen/classlen/ext/version trailer
    b += struct.pack(">h", 0)
    return b


def sds_scaffold(b: Builder, name: str, dims, nt_code=DFNT_INT16,
                 sd_ref=30, base_ref=10):
    """NT + SDD + NDG + Var0.0 Vgroup pointing at the NDG."""
    b.add(DFTAG_NT, base_ref, nt(nt_code))
    b.add(DFTAG_SDD, base_ref + 1, sdd(dims, base_ref))
    b.add(DFTAG_NDG, base_ref + 2,
          ndg([(DFTAG_SDD, base_ref + 1), (DFTAG_NT, base_ref), (DFTAG_SD, sd_ref)]))
    b.add(DFTAG_VG, base_ref + 3, vgroup(name, "Var0.0", [(DFTAG_NDG, base_ref + 2)]))


def _payload(rng, dims):
    return (rng.integers(13000, 16500, size=dims)).astype(">i2")


def test_contiguous_sds_over_two_dd_blocks(tmp_path, rng):
    arr = _payload(rng, (7, 11))
    b = Builder()
    sds_scaffold(b, "LST_Day_1km", (7, 11))
    b.add(DFTAG_SD, 30, arr.tobytes())
    p = tmp_path / "contig.hdf"
    p.write_bytes(b.build(dd_split=2))  # DD chain across two blocks

    f = HDF4File(str(p))
    assert f.sds_names() == ["LST_Day_1km"]
    np.testing.assert_array_equal(f.read_sds("LST_Day_1km"),
                                  arr.astype(np.int16))


def test_whole_element_deflate(tmp_path, rng):
    arr = _payload(rng, (16, 16))
    raw = arr.tobytes()
    b = Builder()
    sds_scaffold(b, "sur_refl_b01", (16, 16), nt_code=DFNT_INT16)
    # extended SD: special header under (TAG_SD|EXT, 30) + compressed payload
    hdr = struct.pack(">hHIHHH", SPECIAL_COMP, 0, len(raw), 77, 0, COMP_DEFLATE)
    b.add(DFTAG_SD | EXT_BIT, 30, hdr)
    b.add(DFTAG_COMPRESSED, 77, zlib.compress(raw, 6))
    p = tmp_path / "deflate.hdf"
    p.write_bytes(b.build())

    f = HDF4File(str(p))
    np.testing.assert_array_equal(f.read_sds("sur_refl_b01"),
                                  arr.astype(np.int16))


def test_linked_blocks_with_chained_table(tmp_path, rng):
    arr = _payload(rng, (10, 13))
    raw = arr.tobytes()
    blk = 64
    blocks = [raw[i : i + blk] for i in range(0, len(raw), blk)]
    if len(blocks[-1]) < blk:  # real files pad the final linked block
        blocks[-1] = blocks[-1] + b"\0" * (blk - len(blocks[-1]))
    b = Builder()
    sds_scaffold(b, "linked_sds", (10, 13))
    # split the block refs over TWO chained tables
    refs = list(range(100, 100 + len(blocks)))
    half = max(1, len(refs) // 2)
    t1 = struct.pack(">H", 99) + struct.pack(f">{half}H", *refs[:half])
    t2 = struct.pack(">H", 0) + struct.pack(f">{len(refs) - half}H", *refs[half:])
    hdr = struct.pack(">hiiiH", SPECIAL_LINKED, len(raw), blk, len(blocks), 98)
    b.add(DFTAG_SD | EXT_BIT, 30, hdr)
    b.add(DFTAG_LINKED, 98, t1)
    b.add(DFTAG_LINKED, 99, t2)
    for r, blk_bytes in zip(refs, blocks):
        b.add(DFTAG_LINKED, r, blk_bytes)
    p = tmp_path / "linked.hdf"
    p.write_bytes(b.build())

    f = HDF4File(str(p))
    np.testing.assert_array_equal(f.read_sds("linked_sds"),
                                  arr.astype(np.int16))


def test_chunked_with_per_chunk_deflate_and_edge_clip(tmp_path, rng):
    dims = (5, 7)          # deliberately NOT a multiple of the chunk size
    chunk = (4, 4)
    arr = _payload(rng, dims)
    b = Builder()
    sds_scaffold(b, "chunked_sds", dims)

    # chunk-table Vdata: origin (2x int32), chk_tag, chk_ref per record
    fields = [("origin", 24, 8, 2), ("chk_tag", 23, 2, 1), ("chk_ref", 23, 2, 1)]
    records = []
    chunk_items = []
    ref = 200
    for oy in range(-(-dims[0] // chunk[0])):
        for ox in range(-(-dims[1] // chunk[1])):
            full = np.zeros(chunk, dtype=">i2")
            sl = np.s_[oy * chunk[0] : (oy + 1) * chunk[0],
                       ox * chunk[1] : (ox + 1) * chunk[1]]
            part = arr[sl]
            full[: part.shape[0], : part.shape[1]] = part
            raw = full.tobytes()
            # each chunk stored as a whole-element-deflate special element
            chdr = struct.pack(">hHIHHH", SPECIAL_COMP, 0, len(raw),
                               ref + 1, 0, COMP_DEFLATE)
            chunk_items.append((DFTAG_SD | EXT_BIT, ref, chdr))
            chunk_items.append((DFTAG_COMPRESSED, ref + 1, zlib.compress(raw)))
            records.append(struct.pack(">iiHH", oy, ox, DFTAG_SD, ref))
            ref += 2

    b.add(DFTAG_VH, 150, vdata_header("_HDF_CHK_TBL_0", fields, len(records)))
    b.add(DFTAG_VS, 150, b"".join(records))
    for t, r, payload in chunk_items:
        b.add(t, r, payload)

    item = 2
    chunked_hdr = struct.pack(
        ">hBiiiiHHHHi",
        SPECIAL_CHUNKED, 1, 0, int(np.prod(dims)) * item,
        int(np.prod(chunk)) * item, item,
        DFTAG_VH, 150, 0, 0, 2,
    )
    for d in range(2):
        chunked_hdr += struct.pack(">iii", 0, dims[d], chunk[d])
    b.add(DFTAG_SD | EXT_BIT, 30, chunked_hdr)
    p = tmp_path / "chunked.hdf"
    p.write_bytes(b.build())

    f = HDF4File(str(p))
    np.testing.assert_array_equal(f.read_sds("chunked_sds"),
                                  arr.astype(np.int16))
    # fused-dtype read assembles per-chunk straight into the target dtype
    np.testing.assert_array_equal(f.read_sds("chunked_sds", dtype=np.float32),
                                  arr.astype(np.int16).astype(np.float32))


def test_structmetadata_geotransform(tmp_path, rng):
    meta = (
        'GROUP=GridStructure\n\tGROUP=GRID_1\n'
        '\t\tXDim=1200\n\t\tYDim=1200\n'
        '\t\tUpperLeftPointMtrs=(-1111950.519667,5559752.598333)\n'
        '\t\tLowerRightMtrs=(0.000000,4447802.078667)\n'
        '\tEND_GROUP=GRID_1\nEND_GROUP=GridStructure\nEND\n'
    )
    payload = meta.encode("ascii")
    b = Builder()
    arr = _payload(rng, (4, 4))
    sds_scaffold(b, "LST_Day_1km", (4, 4))
    b.add(DFTAG_SD, 30, arr.tobytes())
    # text attribute: 1 record of order len(payload), uint8 field
    b.add(DFTAG_VH, 160,
          vdata_header("StructMetadata.0",
                       [("VALUES", 3, len(payload), len(payload))], 1))
    b.add(DFTAG_VS, 160, payload)
    p = tmp_path / "eos.hdf"
    p.write_bytes(b.build())

    f = HDF4File(str(p))
    assert f.text_attribute("StructMetadata.0").startswith("GROUP=GridStructure")
    gt = f.grid_geotransform()
    assert gt is not None
    x0, dx, _, y0, _, dy = gt
    assert x0 == pytest.approx(-1111950.519667)
    assert y0 == pytest.approx(5559752.598333)
    assert dx == pytest.approx((0.0 - -1111950.519667) / 1200)
    assert dy == pytest.approx((4447802.078667 - 5559752.598333) / 1200)


def test_deflate_bomb_rejected(tmp_path, rng):
    """A deflate stream expanding far past its declared uncompressed length
    must raise — the reader bounds the output buffer to the header's
    uncomp_len instead of letting a few-KB payload size a huge allocation."""
    import pytest
    from sifsr_tpu.geo.hdf4 import HDF4Error

    arr = _payload(rng, (16, 16))
    raw = arr.tobytes()
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)  # ~64 MB from ~64 KB
    b = Builder()
    sds_scaffold(b, "sur_refl_b01", (16, 16), nt_code=DFNT_INT16)
    hdr = struct.pack(">hHIHHH", SPECIAL_COMP, 0, len(raw), 77, 0, COMP_DEFLATE)
    b.add(DFTAG_SD | EXT_BIT, 30, hdr)
    b.add(DFTAG_COMPRESSED, 77, bomb)
    p = tmp_path / "bomb.hdf"
    p.write_bytes(b.build())

    f = HDF4File(str(p))
    with pytest.raises(HDF4Error, match="declared uncompressed length"):
        f.read_sds("sur_refl_b01")
