"""[EXTENSION] Pure-Python/numpy GIF codec — no PIL.

GIF87a/89a per the public specification: LZW-compressed palette indices
(variable-width codes, clear/EOI, dictionary to 4096), global/local
color tables, interlaced images (4-pass row shuffle), and multi-frame
animations with graphic-control disposal 0/1 (leave) and 2 (restore to
background) plus transparency composition. Like the sibling PNG/JPEG
codecs (multimodal.py / jpeg.py): decode work happens inside
Arrow-batched ``mapInPandas`` workers, so the Python LZW loop
parallelizes per partition; anything outside the supported profile
declines (returns None) rather than guessing.

Encoder (:func:`encode_gif`) writes real single- or multi-frame GIFs of
palette-exact inputs (<= 256 distinct colors) — the round-trip is
BIT-EXACT, which makes generator-truth oracles possible without ever
consulting the decoder.
"""

from __future__ import annotations


def _lzw_decode(data: bytes, min_code_size: int):
    """GIF-flavor LZW: returns the list of palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # dictionary: code -> byte sequence (list of ints)
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out.extend(entry)
            prev = entry
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def _deinterlace(rows: "list", h: int):
    """GIF 4-pass interlace: pass row strides 8/8/4/2 starting 0/4/2/1."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    out = [None] * h
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return out


def decode_gif_frames(content: bytes):
    """Decode a GIF into ``(frames, width, height)`` where frames is a
    list of (h, w, 3) uint8 RGB arrays — each frame fully COMPOSED onto
    the logical screen (transparency + disposal 0/1/2 honored; other
    disposal modes decline). Returns None outside the supported
    profile."""
    import numpy as np

    if len(content) < 13 or content[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w = int.from_bytes(content[6:8], "little")
    h = int.from_bytes(content[8:10], "little")
    flags = content[10]
    bg_index = content[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if len(content) < pos + 3 * n:
            return None
        gct = np.frombuffer(content[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    if w == 0 or h == 0:
        return None

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < gct.shape[0]:
        canvas[:, :] = gct[bg_index]
    bg = canvas.copy()
    frames = []
    transparent: int | None = None
    disposal = 0
    try:
        while pos < len(content):
            block = content[pos]
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension
                label = content[pos + 1]
                pos += 2
                if label == 0xF9:  # graphic control
                    size = content[pos]
                    gce = content[pos + 1:pos + 1 + size]
                    disposal = (gce[0] >> 2) & 0x07
                    if disposal > 2:
                        return None  # restore-to-previous: out of profile
                    transparent = gce[3] if gce[0] & 0x01 else None
                    pos += 1 + size
                # skip remaining sub-blocks (and the whole body of other
                # extension types)
                while pos < len(content) and content[pos] != 0:
                    pos += 1 + content[pos]
                pos += 1  # block terminator
            elif block == 0x2C:  # image descriptor
                left = int.from_bytes(content[pos + 1:pos + 3], "little")
                top = int.from_bytes(content[pos + 3:pos + 5], "little")
                iw = int.from_bytes(content[pos + 5:pos + 7], "little")
                ih = int.from_bytes(content[pos + 7:pos + 9], "little")
                iflags = content[pos + 9]
                pos += 10
                table = gct
                if iflags & 0x80:  # local color table
                    n = 2 << (iflags & 0x07)
                    if len(content) < pos + 3 * n:
                        return None
                    table = np.frombuffer(content[pos:pos + 3 * n],
                                          dtype=np.uint8).reshape(n, 3)
                    pos += 3 * n
                if table is None or left + iw > w or top + ih > h \
                        or iw == 0 or ih == 0:
                    return None
                min_code = content[pos]
                pos += 1
                data = bytearray()
                while pos < len(content) and content[pos] != 0:
                    size = content[pos]
                    data += content[pos + 1:pos + 1 + size]
                    pos += 1 + size
                pos += 1  # terminator
                idx = _lzw_decode(bytes(data), min_code)
                if len(idx) < iw * ih:
                    return None
                arr = np.array(idx[:iw * ih], dtype=np.int32) \
                    .reshape(ih, iw)
                if iflags & 0x40:  # interlaced
                    arr = np.array(_deinterlace(list(arr), ih))
                if int(arr.max(initial=0)) >= table.shape[0]:
                    return None
                region = canvas[top:top + ih, left:left + iw]
                px = table[arr]
                if transparent is not None:
                    mask = arr != transparent
                    region[mask] = px[mask]
                else:
                    region[:, :] = px
                frames.append(canvas.copy())
                if disposal == 2:  # restore region to background
                    canvas[top:top + ih, left:left + iw] = \
                        bg[top:top + ih, left:left + iw]
                transparent = None
                disposal = 0
            else:
                return None
    except (IndexError, ValueError):
        return None
    if not frames:
        return None
    return frames, w, h


def decode_gif_numpy(content: bytes):
    """First composed frame of a GIF as (h, w, 3) uint8 RGB — the
    single-image entry point :func:`multimodal.decode_image_numpy`
    routes to. None outside the supported profile."""
    out = decode_gif_frames(content)
    if out is None:
        return None
    frames, _, _ = out
    return frames[0]


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev: tuple = ()
    for v in indices:
        cur = prev + (int(v),)
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        # the decoder appends its k-th entry one code LATER than the
        # encoder assigns it (its first post-clear read appends nothing),
        # so the encoder widens one assignment after next_code crosses
        # 2^code_size — the classic GIF off-by-one
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        prev = (int(v),)
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames, interlace: bool = False) -> bytes:
    """Encode one (h, w, 3) uint8 array — or a list of them, emitted as
    an animation over a shared global palette — as a real GIF89a.
    Inputs must be palette-exact (<= 256 distinct colors across all
    frames); the round-trip through :func:`decode_gif_frames` is then
    bit-exact. ``interlace`` writes the first frame interlaced (the
    decoder's 4-pass path)."""
    import numpy as np

    if not isinstance(frames, (list, tuple)):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0)
    if colors.shape[0] > 256:
        raise ValueError("encode_gif needs palette-exact input "
                         f"(got {colors.shape[0]} distinct colors)")
    depth = max(1, int(np.ceil(np.log2(max(colors.shape[0], 2)))))
    n_pal = 1 << depth
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[:colors.shape[0]] = colors
    lut = {tuple(c): i for i, c in enumerate(colors.tolist())}

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT flag+size, bg 0, ar 0
    out += pal.tobytes()
    min_code = max(2, depth)
    for fi, f in enumerate(frames):
        idx = np.array([[lut[tuple(p)] for p in row]
                        for row in f.tolist()], dtype=np.int32)
        rows = list(idx)
        il = interlace and fi == 0
        if il:
            order = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                order.extend(range(start, h, step))
            rows = [rows[r] for r in order]
        flat = np.concatenate(rows) if rows else idx.reshape(-1)
        out += bytes([0x2C]) + (0).to_bytes(2, "little") * 2 \
            + w.to_bytes(2, "little") + h.to_bytes(2, "little") \
            + bytes([0x40 if il else 0x00])
        out.append(min_code)
        lzw = _lzw_encode(flat, min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
