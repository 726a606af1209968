"""Arrow-batch decoders for the Avro/protobuf wire-codec operators.

Round-13 optimization (guide §4.2): the codec ops' DECODE side used to be
positional byte walks built from Catalyst expressions — every varint read
a ~100-node CASE ladder over substring/hex/conv byte loads, higher-order
folds for the block walks, and 1-4 eager localCheckpoints per op staged
between position computations purely for planner health. The per-row
work was small; the cost was structural: each checkpoint is a full
materialization job, and the expression trees dominated analysis +
codegen time (the r12 scale study measured 16x data = +18% wall on
fn_avro_array_blocks — fixed-overhead bound, not data bound).

The replacement is ONE `mapInArrow` per op: the encoded wire arrives as
an Arrow binary column, a per-task Python loop decodes it with exact
integer arithmetic (Python ints are arbitrary-precision; every value is
masked to the int64 wire domain so the semantics match the JVM
expressions bit-for-bit, including the 10-limb uint64-in-signed-carrier
varints), and the op's full output batch goes back through Arrow. No
mid-decode checkpoints, no giant trees — the plan is
scan -> encode projection -> MapInArrow. The decode stays narrow (no
shuffle), initialization is per-task (guide §4.5 shape), and only the
columns the decoder needs cross the boundary (guide §4.1).

Correctness: these functions are the spec decoder — the same zigzag +
varint ladder the oracles recompute. They are exercised by the existing
adversarial-domain tests (10-limb varints, block-split boundaries,
null-union combinations) plus the r13 A/B equivalence tests against the
retired expression decoders' outputs.
"""

from __future__ import annotations

from collections.abc import Iterator

_U64 = (1 << 64) - 1


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Read one base-128 varint at 0-based `pos`; return (zigzag-decoded
    signed value, next position). Accumulates unsigned, masks to the
    64-bit wire domain, then applies the canonical unzigzag
    ``(u >>> 1) ^ -(u & 1)`` — identical to _avro_unzigzag(_pb_vval10)
    on every well-formed wire including the 10-limb |n| >= 2^62 forms."""
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    u &= _U64
    return (u >> 1) ^ -(u & 1), pos


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    """proto3 (non-zigzag) varint: unsigned value in a signed carrier —
    the Python twin of _pb_vval10 without the unzigzag."""
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    u &= _U64
    if u >= 1 << 63:  # signed 64-bit carrier, like the JVM bigint
        u -= 1 << 64
    return u, pos


def _batches(it, cols):
    """Yield per-batch column lists for `cols` from an Arrow batch iter."""
    for batch in it:
        names = batch.schema.names
        yield batch.num_rows, [
            batch.column(names.index(c)).to_pylist() for c in cols
        ]


def _out(pa, schema, data):
    return pa.RecordBatch.from_arrays(
        [pa.array(col, type=field.type) for col, field in zip(data, schema)],
        schema=schema,
    )


# ----------------------------------------------------------- fn_protobuf_wire

PROTOBUF_OUT_DDL = (
    "o_orderkey bigint, priority string, total_cents bigint, "
    "msg_len bigint, roundtrip_ok boolean"
)


def decode_protobuf_wire(it: Iterator) -> Iterator:
    import pyarrow as pa

    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("priority", pa.string()),
            ("total_cents", pa.int64()),
            ("msg_len", pa.int64()),
            ("roundtrip_ok", pa.bool_()),
        ]
    )
    for n, (keys, pris, cents, payloads) in _batches(
        it, ["key_in", "pri_in", "cents_in", "payload"]
    ):
        out = tuple([None] * n for _ in range(5))
        for i in range(n):
            buf = payloads[i]
            if buf is None:
                # negative inputs encode as NULL payload; the expression
                # decoder yielded all-NULL outputs there — mirror that.
                continue
            key_out, p = _read_uvarint(buf, 1)  # field-1 varint after tag 0x08
            p2 = p  # field-2 tag position (0-based)
            slen = buf[p2 + 1]  # proto string len: 1 byte in this message
            pri_out = buf[p2 + 2 : p2 + 2 + slen].decode("utf-8")
            p3 = p2 + 2 + slen  # field-3 tag position
            cents_out, _ = _read_uvarint(buf, p3 + 1)
            out[0][i] = key_out
            out[1][i] = pri_out
            out[2][i] = cents_out
            out[3][i] = len(buf)
            out[4][i] = (
                buf[0] == 0x08
                and buf[p2] == 0x12
                and buf[p3] == 0x18
                and key_out == keys[i]
                and pri_out == pris[i]
                and cents_out == cents[i]
            )
        yield _out(pa, schema, out)


# --------------------------------------------------------------- fn_avro_wire

WIRE_OUT_DDL = (
    "o_orderkey bigint, priority string, cents_delta bigint, "
    "msg_len bigint, roundtrip_ok boolean"
)


def decode_wire(it: Iterator) -> Iterator:
    import pyarrow as pa

    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("priority", pa.string()),
            ("cents_delta", pa.int64()),
            ("msg_len", pa.int64()),
            ("roundtrip_ok", pa.bool_()),
        ]
    )
    for n, (keys, pris, deltas, payloads) in _batches(
        it, ["key_in", "pri_in", "delta_in", "payload"]
    ):
        out = ([None] * n, [None] * n, [None] * n, [None] * n, [None] * n)
        for i in range(n):
            buf = payloads[i]
            key_out, p = _read_varint(buf, 0)
            slen, p = _read_varint(buf, p)
            pri_out = buf[p : p + slen].decode("utf-8")
            p += slen
            delta_out, p = _read_varint(buf, p)
            out[0][i] = key_out
            out[1][i] = pri_out
            out[2][i] = delta_out
            out[3][i] = len(buf)
            out[4][i] = (
                key_out == keys[i] and pri_out == pris[i] and delta_out == deltas[i]
            )
        yield _out(pa, schema, out)


# ----------------------------------------------------- fn_avro_schema_evolution

EVOLUTION_OUT_DDL = (
    "o_orderkey bigint, priority string, cents_delta bigint, "
    "source_id bigint, skipped_len bigint, resolve_ok boolean"
)


def decode_schema_evolution(it: Iterator) -> Iterator:
    import pyarrow as pa

    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("priority", pa.string()),
            ("cents_delta", pa.int64()),
            ("source_id", pa.int64()),
            ("skipped_len", pa.int64()),
            ("resolve_ok", pa.bool_()),
        ]
    )
    for n, (keys, pris, deltas, payloads) in _batches(
        it, ["key_in", "pri_in", "delta_in", "payload"]
    ):
        out = tuple([None] * n for _ in range(6))
        for i in range(n):
            buf = payloads[i]
            # resolution walk in WRITER order: skip `key` by length only
            _, p2 = _read_varint(buf, 0)
            klen = p2  # skip distance: the key varint's byte width
            slen, p = _read_varint(buf, p2)
            pri_out = buf[p : p + slen].decode("utf-8")
            p3 = p + slen
            delta_out, p_end = _read_varint(buf, p3)
            out[0][i] = keys[i]
            out[1][i] = pri_out
            out[2][i] = delta_out
            out[3][i] = 42
            out[4][i] = klen
            out[5][i] = (
                pri_out == pris[i]
                and delta_out == deltas[i]
                # skip + string frame + delta varint must tile the payload
                and p_end == len(buf)
            )
        yield _out(pa, schema, out)


# ------------------------------------------------------- fn_avro_union_nullable

UNION_OUT_DDL = (
    "o_orderkey bigint, priority string, cents_delta bigint, "
    "msg_len bigint, union_ok boolean"
)


def decode_union_nullable(it: Iterator) -> Iterator:
    import pyarrow as pa

    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("priority", pa.string()),
            ("cents_delta", pa.int64()),
            ("msg_len", pa.int64()),
            ("union_ok", pa.bool_()),
        ]
    )
    for n, (keys, pris, deltas, payloads) in _batches(
        it, ["key_in", "pri_in", "delta_in", "payload"]
    ):
        out = tuple([None] * n for _ in range(5))
        for i in range(n):
            buf = payloads[i]
            key_out, p = _read_varint(buf, 0)
            pri_out = None
            if buf[p] == 2:  # some-branch marker, zigzag(1)
                slen, q = _read_varint(buf, p + 1)
                pri_out = buf[q : q + slen].decode("utf-8")
                p = q + slen
            else:  # null branch: exactly one 0x00 byte
                p += 1
            delta_out = None
            if buf[p] == 2:
                delta_out, p = _read_varint(buf, p + 1)
            else:
                p += 1
            out[0][i] = key_out
            out[1][i] = pri_out
            out[2][i] = delta_out
            out[3][i] = len(buf)
            out[4][i] = (
                key_out == keys[i]
                and pri_out == pris[i]
                and delta_out == deltas[i]
                # branch-gated frames must tile the payload exactly
                and p == len(buf)
            )
        yield _out(pa, schema, out)


# ---------------------------------------------------------- fn_avro_container

CONTAINER_OUT_DDL = (
    "ym string, n_records bigint, first_key bigint, file_len bigint, "
    "magic_ok boolean, meta_ok boolean, sync_ok boolean, "
    "framing_ok boolean, first_record_ok boolean"
)


def make_decode_container(magic: bytes, meta: bytes, block_pos0: int, sync_pos0: int):
    """Build the container decoder with the constant header layout baked
    in (0-based offsets; the callers' module-level constants are 1-based
    substring positions)."""

    def decode_container(it: Iterator) -> Iterator:
        import pyarrow as pa

        schema = pa.schema(
            [
                ("ym", pa.string()),
                ("n_records", pa.int64()),
                ("first_key", pa.int64()),
                ("file_len", pa.int64()),
                ("magic_ok", pa.bool_()),
                ("meta_ok", pa.bool_()),
                ("sync_ok", pa.bool_()),
                ("framing_ok", pa.bool_()),
                ("first_record_ok", pa.bool_()),
            ]
        )
        cols = [
            "ym",
            "n_in",
            "first_key_in",
            "first_pri_in",
            "first_delta_in",
            "payload",
        ]
        for n, (yms, n_ins, fk_ins, fp_ins, fd_ins, payloads) in _batches(it, cols):
            out = tuple([None] * n for _ in range(9))
            for i in range(n):
                buf = payloads[i]
                n_out, p = _read_varint(buf, block_pos0)
                rsize, p_rec = _read_varint(buf, p)
                # first record: key, string frame, delta
                k1, q = _read_varint(buf, p_rec)
                plen, q = _read_varint(buf, q)
                pri1 = buf[q : q + plen].decode("utf-8")
                q += plen
                d1, _ = _read_varint(buf, q)
                hdr_sync = buf[sync_pos0 : sync_pos0 + 16]
                tail_sync = buf[p_rec + rsize : p_rec + rsize + 16]
                out[0][i] = yms[i]
                out[1][i] = n_out
                out[2][i] = k1
                out[3][i] = len(buf)
                out[4][i] = buf[:4] == magic
                out[5][i] = buf[4 : 4 + len(meta)] == meta
                out[6][i] = hdr_sync == tail_sync
                out[7][i] = n_out == n_ins[i] and p_rec + rsize + 16 == len(buf)
                out[8][i] = (
                    k1 == fk_ins[i] and pri1 == fp_ins[i] and d1 == fd_ins[i]
                )
            yield _out(pa, schema, out)

    return decode_container


# -------------------------------------------------------- fn_avro_array_blocks

ARRAY_BLOCKS_OUT_DDL = (
    "o_orderkey bigint, n_items bigint, sum_vals bigint, n_blocks bigint, "
    "block2_size bigint, wire_len bigint, blocks_ok boolean"
)


def decode_array_blocks(it: Iterator) -> Iterator:
    import pyarrow as pa

    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("n_items", pa.int64()),
            ("sum_vals", pa.int64()),
            ("n_blocks", pa.int64()),
            ("block2_size", pa.int64()),
            ("wire_len", pa.int64()),
            ("blocks_ok", pa.bool_()),
        ]
    )
    for n, (keys, items_col, n_ins, payloads) in _batches(
        it, ["key_in", "items", "n_in", "payload"]
    ):
        out = tuple([None] * n for _ in range(7))
        for i in range(n):
            buf = payloads[i]
            key_out, p = _read_varint(buf, 0)
            c1_out, p = _read_varint(buf, p)
            s1 = 0
            for _ in range(c1_out):  # block-1 item walk
                v, p = _read_varint(buf, p)
                s1 += v
            q_end = p
            hdr2, p_hdr2_end = _read_varint(buf, q_end)
            has_b2 = hdr2 < 0
            c2_out = -hdr2 if has_b2 else 0
            bsize_out = None
            s2 = 0
            if has_b2:
                bsize_out, r0 = _read_varint(buf, p_hdr2_end)
                p = r0
                for _ in range(c2_out):  # block-2 item walk
                    v, p = _read_varint(buf, p)
                    s2 += v
                walk2_pos = p
                term_pos = r0 + bsize_out  # fast-skip jump
            else:
                walk2_pos = q_end
                term_pos = q_end
            s64 = lambda x: (x + (1 << 63)) % (1 << 64) - (1 << 63)
            decoded_sum = s64(s1 + s2)
            input_sum = s64(sum(items_col[i]))
            out[0][i] = key_out
            out[1][i] = c1_out + c2_out
            out[2][i] = decoded_sum
            out[3][i] = 2 if has_b2 else 1
            out[4][i] = bsize_out
            out[5][i] = len(buf)
            out[6][i] = (
                key_out == keys[i]
                and c1_out + c2_out == n_ins[i]
                and decoded_sum == input_sum
                # (1) fast-skip: size prefix alone must land on the terminator
                and term_pos < len(buf)
                and buf[term_pos] == 0
                # (3) tiling: the terminator is the last payload byte
                and term_pos == len(buf) - 1
                # (2) item walk == fast-skip jump
                and (
                    walk2_pos == term_pos if has_b2 else hdr2 == 0
                )
            )
        yield _out(pa, schema, out)


# ---------------------------------------------------------- fn_avro_map_blocks

MAP_BLOCKS_OUT_DDL = (
    "o_custkey bigint, n_entries bigint, key_bytes bigint, sum_vals bigint, "
    "n_blocks bigint, block2_size bigint, wire_len bigint, map_ok boolean"
)


def decode_map_blocks(it: Iterator) -> Iterator:
    import pyarrow as pa

    schema = pa.schema(
        [
            ("o_custkey", pa.int64()),
            ("n_entries", pa.int64()),
            ("key_bytes", pa.int64()),
            ("sum_vals", pa.int64()),
            ("n_blocks", pa.int64()),
            ("block2_size", pa.int64()),
            ("wire_len", pa.int64()),
            ("map_ok", pa.bool_()),
        ]
    )

    def entry_walk(buf: bytes, pos: int, count: int) -> tuple[int, int, int]:
        """(next_pos, key_byte_total, value_sum) over `count` k-v entries:
        a key step reads zigzag(klen) and jumps klen raw bytes (the
        data-dependent advance), a value step decodes the value varint."""
        kb = s = 0
        for _ in range(count):
            klen, pos = _read_varint(buf, pos)
            pos += klen  # raw key bytes: skipped, only the length matters
            kb += klen
            v, pos = _read_varint(buf, pos)
            s += v
        return pos, kb, s

    for n, (keys, n_ins, kb_ins, vs_ins, payloads) in _batches(
        it, ["key_in", "n_in", "kb_in", "vs_in", "payload"]
    ):
        out = tuple([None] * n for _ in range(8))
        for i in range(n):
            buf = payloads[i]
            key_out, p = _read_varint(buf, 0)
            c1_out, p = _read_varint(buf, p)
            q_end, kb1, s1 = entry_walk(buf, p, c1_out)
            hdr2, p_hdr2_end = _read_varint(buf, q_end)
            has_b2 = hdr2 < 0
            c2_out = -hdr2 if has_b2 else 0
            bsize_out = None
            kb2 = s2 = 0
            if has_b2:
                bsize_out, r0 = _read_varint(buf, p_hdr2_end)
                walk2_pos, kb2, s2 = entry_walk(buf, r0, c2_out)
                term_pos = r0 + bsize_out  # fast-skip jump
            else:
                walk2_pos = q_end
                term_pos = q_end
            s64 = lambda x: (x + (1 << 63)) % (1 << 64) - (1 << 63)
            out[0][i] = key_out
            out[1][i] = c1_out + c2_out
            out[2][i] = kb1 + kb2
            out[3][i] = s64(s1 + s2)
            out[4][i] = 2 if has_b2 else 1
            out[5][i] = bsize_out
            out[6][i] = len(buf)
            out[7][i] = (
                key_out == keys[i]
                and c1_out + c2_out == n_ins[i]
                and kb1 + kb2 == kb_ins[i]
                and s64(s1 + s2) == vs_ins[i]
                and term_pos < len(buf)
                and buf[term_pos] == 0
                and term_pos == len(buf) - 1
                and (walk2_pos == term_pos if has_b2 else hdr2 == 0)
            )
        yield _out(pa, schema, out)
