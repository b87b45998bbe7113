#!/usr/bin/env python3
"""Generate the netCDF-4-conventions golden file for NetcdfSpec.

Stdlib-only, written against the PUBLIC HDF5 file-format specification
(superblock v0, v1 object headers, symbol-table groups, local/global
heaps) plus the netCDF-4 layout conventions that netcdf4-python/xarray
produce (dimension scales with CLASS/NAME, DIMENSION_LIST vlen-of-
object-reference attrs, REFERENCE_LIST compound attrs, _NCProperties,
_FillValue, CF time units). No h5py/xarray/netCDF exists in this
container, so this generator is the independent byte producer: it shares
NO code with graft's Scala HDF5/netCDF reader or writer, which is the
point — `Netcdf.readCube` is pinned against bytes it did not write.

Layout being modeled (tiny 2-band cube):
  Band      int64[2]  = [0, 5], units="days since 2020-01-01 00:00:00",
            CLASS=DIMENSION_SCALE, NAME="Band", REFERENCE_LIST
  Azimuth   int64[3]  = [0,1,2], CLASS, NAME="Azimuth"
  Range     int64[4]  = [0..3], CLASS, NAME=<netCDF phantom-dim string>
  Intensity float32[2,3,4], v=b*100+a*10+r (NaN at b1,a2,r3),
            DIMENSION_LIST, _FillValue, look_side=["LEFT","RIGHT"],
            incidence_center=[21.5, 30.25]
  root      title="graft golden cube", _NCProperties=<library provenance>

Regenerate with:  python3 tools/make_netcdf_golden.py
Output:           src/test/resources/golden/netcdf4_conventions.nc
"""
import struct
import math

UNDEF = 0xFFFFFFFFFFFFFFFF


def pad8(b: bytes) -> bytes:
    return b + b"\0" * ((8 - len(b) % 8) % 8)


class Buf:
    def __init__(self):
        self.b = bytearray()

    def w(self, data: bytes) -> int:
        off = len(self.b)
        self.b += data
        return off

    def patch_u64(self, off: int, v: int) -> None:
        self.b[off:off + 8] = struct.pack("<Q", v)


# ---------------------------------------------------------------- messages
def msg(mtype: int, body: bytes) -> bytes:
    body = pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def ohdr_v1(msgs) -> bytes:
    data = b"".join(msgs)
    # version(1) reserved(1) nmsgs(2) refcount(4) hdrsize(4) + 4-byte pad
    return struct.pack("<BxHII4x", 1, len(msgs), 1, len(data)) + data


def dspace(dims) -> bytes:
    # v1: version(1) rank(1) flags(1) reserved(5), then u64 dims
    return struct.pack("<BBB5x", 1, len(dims), 0) + b"".join(
        struct.pack("<Q", d) for d in dims)


def dt_int64() -> bytes:
    # class 0 fixed-point v1; bit0 LE=0, bit3 signed; props: offset, precision
    return struct.pack("<BBBBI", 0x10, 0x08, 0, 0, 8) + struct.pack("<HH", 0, 64)


def dt_uint32() -> bytes:
    return struct.pack("<BBBBI", 0x10, 0x00, 0, 0, 4) + struct.pack("<HH", 0, 32)


def dt_f32() -> bytes:
    # class 1 float v1; byte0: mantissa-norm=2 (<<4); byte1: sign bit 31
    return struct.pack("<BBBBI", 0x11, 0x20, 31, 0, 4) + \
        struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)


def dt_f64() -> bytes:
    return struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8) + \
        struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)


def dt_str(size: int) -> bytes:
    # class 3 string v1, null-terminated ASCII
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, size)


def dt_objref() -> bytes:
    # class 7 reference v1, type 0 = object reference
    return struct.pack("<BBBBI", 0x17, 0, 0, 0, 8)


def dt_vlen_objref() -> bytes:
    # class 9 vlen v1 of object references (type=0 sequence); the 16-byte
    # disk form is (length u32, gheap collection u64, gheap index u32)
    return struct.pack("<BBBBI", 0x19, 0, 0, 0, 16) + dt_objref()


def dt_reference_list() -> bytes:
    # class 6 compound v1 {dataset: objref @0, dimension: uint32 @8}, the
    # REFERENCE_LIST member layout netCDF-C attaches to dimension scales
    def member(name: str, offset: int, base: bytes) -> bytes:
        return pad8(name.encode() + b"\0") + \
            struct.pack("<IB3xII", offset, 0, 0, 0) + \
            struct.pack("<IIII", 0, 0, 0, 0) + base
    return struct.pack("<BBBBI", 0x16, 2, 0, 0, 12) + \
        member("dataset", 0, dt_objref()) + member("dimension", 8, dt_uint32())


def attr(name: str, dt: bytes, ds: bytes, data: bytes) -> bytes:
    nameb = name.encode() + b"\0"
    head = struct.pack("<BxHHH", 1, len(nameb), len(dt), len(ds))
    return msg(0x0C, head + pad8(nameb) + pad8(dt) + pad8(ds) + data)


def str_attr(name: str, values, size=None) -> bytes:
    size = size or max(len(v) for v in values) + 1
    data = b"".join(v.encode().ljust(size, b"\0") for v in values)
    ds = dspace([len(values)]) if len(values) > 1 else dspace([])
    # scalar string attrs use a rank-0 dataspace like h5py writes them
    if len(values) == 1:
        ds = struct.pack("<BBB5x", 1, 0, 0)
    return attr(name, dt_str(size), ds, data)


def layout_contiguous(addr: int, size: int) -> bytes:
    return msg(0x08, struct.pack("<BBQQ", 3, 1, addr, size))


def main() -> None:
    f = Buf()

    # --- superblock v0 (56-byte body + 40-byte root symbol-table entry)
    f.w(b"\x89HDF\r\n\x1a\n")
    f.w(struct.pack("<8B", 0, 0, 0, 0, 0, 8, 8, 0))   # versions, offsets=lengths=8
    f.w(struct.pack("<HHI", 4, 16, 0))                  # leaf K, internal K, flags
    f.w(struct.pack("<QQ", 0, UNDEF))                   # base, free-space
    eof_patch = f.w(struct.pack("<Q", 0))               # EOF (patched)
    f.w(struct.pack("<Q", UNDEF))                       # driver info
    root_ste = f.w(struct.pack("<QQII16x", 0, 0, 1, 0))  # link 0, ohdr (patched),
    #                                                     cached-stab scratch (patched)

    # --- raw dataset payloads
    band_addr = f.w(struct.pack("<2q", 0, 5))           # days since 2020-01-01
    az_addr = f.w(struct.pack("<3q", 0, 1, 2))
    rg_addr = f.w(struct.pack("<4q", 0, 1, 2, 3))
    vals = [float(b * 100 + a * 10 + r) for b in range(2)
            for a in range(3) for r in range(4)]
    vals[-1] = math.nan                                  # (1,2,3) → null pixel
    int_addr = f.w(struct.pack("<24f", *vals))

    # --- global heap collection backing the DIMENSION_LIST vlen refs
    gcol_addr = f.w(b"GCOL" + struct.pack("<B3xQ", 1, 160))
    ref_slots = []
    for i in range(3):  # objects 1..3: one 8-byte object reference each
        f.w(struct.pack("<HHI Q", i + 1, 0, 0, 8))
        ref_slots.append(f.w(struct.pack("<Q", 0)))      # patched to dim ohdrs
    f.w(struct.pack("<HHIQ", 0, 0, 0, 160 - 16 - 3 * 24))  # free-space object
    f.w(b"\0" * (160 - 16 - 3 * 24 - 16))

    # --- local heap: name segment (offset 0 kept empty, names from 8)
    names = ["Azimuth", "Band", "Intensity", "Range"]
    seg = bytearray(b"\0" * 8)
    name_off = {}
    for n in names:
        name_off[n] = len(seg)
        seg += n.encode() + b"\0"
    seg = bytes(seg) + b"\0" * ((8 - len(seg) % 8) % 8)
    heap_addr = f.w(b"HEAP" + struct.pack("<B3xQQQ", 0, len(seg), 1, 0))
    heap_seg_patch = heap_addr + 24
    seg_addr = f.w(seg)
    f.patch_u64(heap_seg_patch, seg_addr)

    # --- dimension-scale dataset object headers
    phantom = "This is a netCDF dimension but not a netCDF variable." + \
        ("%10d" % 4)

    def scale_ohdr(dims, data_addr, extra):
        return ohdr_v1([
            msg(0x01, dspace(dims)),
            msg(0x03, dt_int64()),
            layout_contiguous(data_addr, 8 * dims[0]),
            str_attr("CLASS", ["DIMENSION_SCALE"]),
        ] + extra)

    band_reflist_data_off = None
    band_body = scale_ohdr([2], band_addr, [
        str_attr("NAME", ["Band"]),
        str_attr("units", ["days since 2020-01-01 00:00:00"]),
        attr("REFERENCE_LIST", dt_reference_list(), dspace([1]),
             struct.pack("<QI", 0, 0)),  # (Intensity ref, dim 0) — patched
    ])
    band_ohdr = f.w(band_body)
    # the reference payload sits at the tail of the last message body
    band_reflist_data_off = band_ohdr + len(band_body) - pad8_len(12)

    az_ohdr = f.w(scale_ohdr([3], az_addr, [str_attr("NAME", ["Azimuth"])]))
    rg_ohdr = f.w(scale_ohdr([4], rg_addr, [str_attr("NAME", [phantom])]))

    for slot, target in zip(ref_slots, [band_ohdr, az_ohdr, rg_ohdr]):
        f.patch_u64(slot, target)

    # --- Intensity data variable
    dim_list_data = b"".join(
        struct.pack("<IQI", 1, gcol_addr, i + 1) for i in range(3))
    fill = struct.pack("<f", math.nan)
    intensity_ohdr = f.w(ohdr_v1([
        msg(0x01, dspace([2, 3, 4])),
        msg(0x03, dt_f32()),
        layout_contiguous(int_addr, 96),
        attr("DIMENSION_LIST", dt_vlen_objref(), dspace([3]), dim_list_data),
        attr("_FillValue", dt_f32(), struct.pack("<BBB5x", 1, 0, 0), fill),
        str_attr("look_side", ["LEFT", "RIGHT"], size=6),
        attr("incidence_center", dt_f64(), dspace([2]),
             struct.pack("<2d", 21.5, 30.25)),
    ]))
    f.patch_u64(band_reflist_data_off, intensity_ohdr)

    # --- root group: B-tree → SNOD (entries sorted by link name)
    snod_entries = b"".join(
        struct.pack("<QQII16x", name_off[n], o, 0, 0)
        for n, o in [("Azimuth", az_ohdr), ("Band", band_ohdr),
                     ("Intensity", intensity_ohdr), ("Range", rg_ohdr)])
    snod_addr = f.w(b"SNOD" + struct.pack("<BxH", 1, 4) + snod_entries)
    btree_addr = f.w(b"TREE" + struct.pack("<BBH", 0, 0, 1) +
                     struct.pack("<QQ", UNDEF, UNDEF) +
                     struct.pack("<QQQ", 0, snod_addr, name_off["Range"]))

    # --- root object header: symbol-table message + root attrs
    root_ohdr = f.w(ohdr_v1([
        msg(0x11, struct.pack("<QQ", btree_addr, heap_addr)),
        str_attr("title", ["graft golden cube"]),
        str_attr("_NCProperties", ["version=2,netcdf=4.9.2,hdf5=1.12.2"]),
    ]))
    f.patch_u64(root_ste, 0)              # link name offset
    f.patch_u64(root_ste + 8, root_ohdr)  # object header address
    f.patch_u64(root_ste + 24, btree_addr)   # cached scratch: btree
    f.patch_u64(root_ste + 32, heap_addr)    # cached scratch: heap
    f.patch_u64(eof_patch, len(f.b))

    out = "src/test/resources/golden/netcdf4_conventions.nc"
    import os
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as fh:
        fh.write(bytes(f.b))
    print(f"wrote {out}: {len(f.b)} bytes")


def pad8_len(n: int) -> int:
    return (n + 7) // 8 * 8


if __name__ == "__main__":
    main()
