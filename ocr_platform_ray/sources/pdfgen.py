"""Minimal public-spec PDF WRITER — deterministic test-fixture generator.

Produces genuine ISO 32000 PDFs (classic xref table, or object-stream +
xref-stream layout) so the real byte-stream parser in ``stages/pdf.py``
has honest inputs without committing binaries.  Covers the features the
parser must handle: Flate-compressed content streams, literal strings with
escapes, hex strings, TJ kerning arrays, Td/TD/Tm/T*/'/" positioning, and
multiple fonts/sizes (role inference input).

Mirrors the capability at reference apps/queue/src/lib/ocr.ts:20-54 (pdf-lib
document load) from the producing side; everything here is plain public
PDF syntax."""

from __future__ import annotations

import zlib

# module-top so pickle-by-value captures them: the encryptors run on Ray
# WORKERS (corpus-builder map_batches closures call them), where a lazy
# relative import fails when the driver runs from a foreign cwd
from ..stages.aes import aes_cbc_encrypt, aes_ecb_encrypt, pkcs7_pad


def _esc(s: str) -> bytes:
    """Escape a literal PDF string: \\, (, ) — and encode latin-1 (the
    WinAnsi-ish subset our fixtures use)."""
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)").encode("latin-1", "replace")
    )


def ahx_encode(data: bytes) -> bytes:
    """Independent ASCIIHexDecode encoder (§7.4.2): hex digits in
    64-char lines + the ``>`` EOD (the line breaks exercise the
    decoder's whitespace rule)."""
    h = data.hex().encode("ascii")
    lines = [h[i : i + 64] for i in range(0, len(h), 64)]
    return b"\n".join(lines) + b">"


def a85_encode(data: bytes) -> bytes:
    """Independent ASCII85Decode encoder (§7.4.3), written from the
    spec so a round-trip against ``stages/pdf._a85_decode`` cannot pass
    through a shared bug: 4-byte groups to 5 base-85 chars (``!``..``u``),
    the all-zero group emitted as ``z``, a final partial group of n
    bytes as n+1 chars from the zero-padded group, ``~>`` EOD."""
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        pad = 4 - len(chunk)
        v = int.from_bytes(chunk + b"\x00" * pad, "big")
        if v == 0 and pad == 0:
            out += b"z"
            continue
        digits = bytearray(5)
        for j in range(4, -1, -1):
            digits[j] = 33 + v % 85
            v //= 85
        out += digits[: 5 - pad]
    return bytes(out) + b"~>"


def rle_compress(data: bytes) -> bytes:
    """Independent RunLengthDecode encoder (§7.4.5): repeat runs (>= 3,
    <= 128) as [257-len, byte], literals (<= 128) as [len-1, bytes...],
    128 EOD."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            if lit_start < i:
                lit = data[lit_start:i]
                for j in range(0, len(lit), 128):
                    part = lit[j : j + 128]
                    out += bytes([len(part) - 1]) + part
            out += bytes([257 - run, data[i]])
            i += run
            lit_start = i
        else:
            i += run
    if lit_start < i:
        lit = data[lit_start:i]
        for j in range(0, len(lit), 128):
            part = lit[j : j + 128]
            out += bytes([len(part) - 1]) + part
    return bytes(out) + b"\x80"


def lzw_compress(data: bytes, early: int = 1) -> bytes:
    """Independent LZW ENCODER (ISO 32000-1 §7.4.4, EarlyChange default)
    for fixture streams — own table/width logic so the round-trip test
    against ``stages/pdf._lzw_decode`` cannot pass through a shared bug."""
    out = bytearray()
    bitbuf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)  # clear table
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # decoder grows its width when its table hits 2^width - early;
        # its table lags this encoder's next_code by exactly one entry
        if next_code - 1 >= (1 << width) - early and width < 12:
            width += 1
        w = c
        if next_code >= (1 << 12) - early:
            # 12-bit table exhausted: clear and restart (spec behavior)
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
    if w:
        emit(table[w], width)
    emit(257, width)  # EOD
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


# deterministic junk "JPEG" for DCTDecode image XObjects: a real SOI/EOI
# envelope around noise — the parser must SKIP it (unsupported image
# codec), not fail the page
_FAKE_JPEG = bytes.fromhex("ffd8ffe000104a46494600") + bytes(range(256)) * 4 + bytes.fromhex("ffd9")


class _PdfBuilder:
    def __init__(self):
        self.objects: dict[int, bytes] = {}
        self._next = 1

    def add(self, body: bytes) -> int:
        n = self._next
        self._next += 1
        self.objects[n] = body
        return n

    def reserve(self) -> int:
        n = self._next
        self._next += 1
        return n

    def set(self, n: int, body: bytes) -> None:
        self.objects[n] = body

    def stream_obj(
        self,
        dict_extra: bytes,
        data: bytes,
        *,
        compress: bool = True,
        use_lzw: bool = False,
        use_rle: bool = False,
        ascii_wrap: str | None = None,
    ) -> int:
        if use_rle:
            data = rle_compress(data)
            filt = b"/Filter /RunLengthDecode "
            names = [b"/RunLengthDecode"]
        elif use_lzw:
            data = lzw_compress(data)
            filt = b"/Filter /LZWDecode "
            names = [b"/LZWDecode"]
        elif compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
            names = [b"/FlateDecode"]
        else:
            filt = b""
            names = []
        if ascii_wrap:
            # cascade: the ascii filter is applied LAST on encode, so it
            # comes FIRST in the /Filter array on decode
            enc, name = {
                "a85": (a85_encode, b"/ASCII85Decode"),
                "ahx": (ahx_encode, b"/ASCIIHexDecode"),
            }[ascii_wrap]
            data = enc(data)
            names = [name] + names
            filt = (
                b"/Filter [" + b" ".join(names) + b"] "
                if len(names) > 1
                else b"/Filter " + names[0] + b" "
            )
        d = b"<< " + filt + dict_extra + b"/Length " + str(len(data)).encode() + b" >>"
        return self.add(d + b"\nstream\n" + data + b"\nendstream")

    def render(self, root: int, *, use_objstm: bool = False,
               info: int | None = None) -> bytes:
        """Serialize with a classic xref table, or (use_objstm) pack every
        non-stream object into an /ObjStm and point to it from an
        xref-stream (no predictor) — both public-spec layouts."""
        out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
        if not use_objstm:
            offsets = {}
            for n in sorted(self.objects):
                offsets[n] = len(out)
                out += f"{n} 0 obj\n".encode() + self.objects[n] + b"\nendobj\n"
            xref_at = len(out)
            size = max(self.objects) + 1
            out += f"xref\n0 {size}\n".encode()
            out += b"0000000000 65535 f \n"
            for n in range(1, size):
                out += f"{offsets.get(n, 0):010d} 00000 n \n".encode()
            info_r = (
                b" /Info " + str(info).encode() + b" 0 R" if info else b""
            )
            out += (
                b"trailer\n<< /Size "
                + str(size).encode()
                + b" /Root "
                + str(root).encode()
                + b" 0 R" + info_r + b" >>\nstartxref\n"
                + str(xref_at).encode()
                + b"\n%%EOF\n"
            )
            return bytes(out)

        # object-stream layout: streams stay top-level, dicts go into ObjStm
        plain = {n: b for n, b in self.objects.items() if b"\nstream\n" not in b}
        tops = {n: b for n, b in self.objects.items() if n not in plain}
        parts, offs, pos = [], [], 0
        for n in sorted(plain):
            offs.append(f"{n} {pos}".encode())
            body = plain[n] + b" "
            parts.append(body)
            pos += len(body)
        payload = b" ".join(offs) + b"\n" + b"".join(parts)
        first = len(b" ".join(offs)) + 1
        comp = zlib.compress(payload)
        objstm_n = self._next
        self._next += 1
        objstm = (
            b"<< /Type /ObjStm /N "
            + str(len(plain)).encode()
            + b" /First "
            + str(first).encode()
            + b" /Filter /FlateDecode /Length "
            + str(len(comp)).encode()
            + b" >>\nstream\n"
            + comp
            + b"\nendstream"
        )
        offsets = {}
        for n in sorted(tops):
            offsets[n] = len(out)
            out += f"{n} 0 obj\n".encode() + tops[n] + b"\nendobj\n"
        offsets[objstm_n] = len(out)
        out += f"{objstm_n} 0 obj\n".encode() + objstm + b"\nendobj\n"

        # xref stream: /W [1 4 1]; type 1 = offset, type 2 = (objstm, idx)
        xref_n = self._next
        self._next += 1
        size = xref_n + 1
        rows = bytearray()
        rows += bytes([0]) + (0).to_bytes(4, "big") + bytes([255])  # obj 0 free
        for n in range(1, size):
            if n in offsets:
                rows += bytes([1]) + offsets[n].to_bytes(4, "big") + bytes([0])
            elif n in plain:
                idx = sorted(plain).index(n)
                rows += bytes([2]) + objstm_n.to_bytes(4, "big") + bytes([idx])
            else:  # the xref stream itself (type 1, patched below)
                rows += bytes([1]) + (0).to_bytes(4, "big") + bytes([0])
        xref_at = len(out)
        rows[-6:] = bytes([1]) + xref_at.to_bytes(4, "big") + bytes([0])
        comp_rows = zlib.compress(bytes(rows))
        out += (
            f"{xref_n} 0 obj\n".encode()
            + b"<< /Type /XRef /Size "
            + str(size).encode()
            + b" /W [1 4 1] /Root "
            + str(root).encode()
            + b" 0 R /Filter /FlateDecode /Length "
            + str(len(comp_rows)).encode()
            + b" >>\nstream\n"
            + comp_rows
            + b"\nendstream\nendobj\n"
        )
        out += b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
        return bytes(out)


def _tounicode_cmap(cid_map: dict[str, int]) -> bytes:
    """Standard ToUnicode CMap (Adobe-Identity-UCS shape): 2-byte
    codespace, bfchar sections of <=100 entries (spec limit)."""
    entries = sorted((cid, ch) for ch, cid in cid_map.items())
    parts = [
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    ]
    for i in range(0, len(entries), 100):
        chunk = entries[i : i + 100]
        parts.append(f"{len(chunk)} beginbfchar\n".encode())
        for cid, ch in chunk:
            dst = ch.encode("utf-16-be").hex()
            parts.append(f"<{cid:04x}> <{dst}>\n".encode())
        parts.append(b"endbfchar\n")
    parts.append(b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
    return b"".join(parts)


def make_pdf(
    pages: list[list[dict]],
    *,
    page_w: float = 612,
    page_h: float = 792,
    compress: bool = True,
    use_objstm: bool = False,
    use_tm: bool = False,
    use_cid: bool = False,
    use_form_xobj: bool = False,
    use_lzw: bool = False,
    use_rle: bool = False,
    ascii_wrap: str | None = None,
    dct_image: bool = False,
    outline: list[tuple[int, str, int]] | None = None,
    info: dict[str, str] | None = None,
) -> bytes:
    """Build a real multi-page PDF.  Each page is a list of text items:
    ``{"text": str, "x": float, "y": float (TOP-DOWN), "size": float,
    "tj": bool (emit as TJ kerning array), "hex": bool (hex string)}``.
    y is given top-down for fixture convenience and converted to PDF's
    bottom-up coordinates here.

    ``use_cid=True`` emits a Type0 / Identity-H font with a ToUnicode
    CMap: every unique character gets a CID, show strings are 2-byte hex
    code sequences — the LaTeX/Word subset-font shape, and the only way
    non-Latin text travels through a PDF.  Readable back ONLY via the
    CMap (stages/pdf.py parse_tounicode).

    ``use_form_xobj=True`` moves the second half of each page's items
    into a /Form XObject painted via ``/Fx1 Do`` (the header/footer/
    letterhead shape word processors emit) — readable back only if the
    parser executes XObject streams.

    ``use_lzw=True`` LZW-encodes the content streams (legacy writers);
    ``use_rle=True`` RunLength-encodes them; ``ascii_wrap="a85"/"ahx"``
    wraps the (compressed) stream in ASCII85/ASCIIHex — a two-filter
    cascade exercising the /Filter array path;
    ``dct_image=True`` embeds a DCTDecode image XObject painted before
    the text on every page (the scanned-book shape) — the parser must
    salvage the page's text around the undecodable image, not fail."""
    b = _PdfBuilder()
    if use_cid:
        chars = sorted({ch for items in pages for it in items for ch in it["text"]})
        cid_map = {ch: i + 1 for i, ch in enumerate(chars)}
        tounicode = b.stream_obj(b"", _tounicode_cmap(cid_map), compress=compress)
        desc = b.add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FakeCID "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>"
        )
        font = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeCID /Encoding /Identity-H "
            b"/DescendantFonts [" + str(desc).encode() + b" 0 R] /ToUnicode "
            + str(tounicode).encode()
            + b" 0 R >>"
        )

        def _cid_hex(t: str) -> bytes:
            return b"<" + "".join(f"{cid_map[ch]:04x}" for ch in t).encode() + b">"

    else:
        font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    pages_root = b.reserve()

    def text_ops(items: list[dict]) -> list[bytes]:
        ops = [b"BT"]
        for it in items:
            size = it.get("size", 12)
            x = it["x"]
            y = page_h - it["y"] - size  # top-down fixture y -> PDF y
            ops.append(b"/F1 " + f"{size:g}".encode() + b" Tf")
            if use_tm:
                ops.append(f"1 0 0 1 {x:g} {y:g}".encode() + b" Tm")
            else:
                # absolute positioning per item via Tm is simpler, but Td
                # coverage matters: emit a Tm reset then a Td move
                ops.append(b"1 0 0 1 0 0 Tm")
                ops.append(f"{x:g} {y:g}".encode() + b" Td")
            t = it["text"]
            if use_cid:
                if it.get("tj"):
                    mid = max(1, len(t) // 2)
                    ops.append(
                        b"[ " + _cid_hex(t[:mid]) + b" -28 " + _cid_hex(t[mid:]) + b" ] TJ"
                    )
                else:
                    ops.append(_cid_hex(t) + b" Tj")
            elif it.get("hex"):
                ops.append(b"<" + t.encode("latin-1", "replace").hex().encode() + b"> Tj")
            elif it.get("tj"):
                mid = max(1, len(t) // 2)
                ops.append(
                    b"[ (" + _esc(t[:mid]) + b") -28 (" + _esc(t[mid:]) + b") ] TJ"
                )
            else:
                ops.append(b"(" + _esc(t) + b") Tj")
        ops.append(b"ET")
        return ops

    image = None
    if dct_image:
        image = b.add(
            b"<< /Type /XObject /Subtype /Image /Width 32 /Height 32 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode "
            b"/Length " + str(len(_FAKE_JPEG)).encode() + b" >>\nstream\n"
            + _FAKE_JPEG
            + b"\nendstream"
        )
    kids = []
    for items in pages:
        if use_form_xobj and len(items) > 1:
            split = len(items) // 2
            page_items, form_items = items[:split], items[split:]
        else:
            page_items, form_items = items, []
        ops = text_ops(page_items)
        xobjs: list[bytes] = []
        if image is not None:
            # paint the image BEFORE the text so the interpreter must
            # pass over the undecodable XObject and keep going
            ops.insert(0, b"q 150 0 0 150 400 80 cm /Im1 Do Q")
            xobjs.append(b"/Im1 " + str(image).encode() + b" 0 R")
        if form_items:
            form = b.stream_obj(
                b"/Type /XObject /Subtype /Form /BBox [0 0 "
                + f"{page_w:g} {page_h:g}".encode()
                + b"] /Resources << /Font << /F1 "
                + str(font).encode()
                + b" 0 R >> >> ",
                b"\n".join(text_ops(form_items)),
                compress=compress,
            )
            ops.append(b"/Fx1 Do")
            xobjs.append(b"/Fx1 " + str(form).encode() + b" 0 R")
        xobj_res = (b"/XObject << " + b" ".join(xobjs) + b" >> ") if xobjs else b""
        content = b.stream_obj(
            b"", b"\n".join(ops), compress=compress, use_lzw=use_lzw,
            use_rle=use_rle, ascii_wrap=ascii_wrap,
        )
        page = b.add(
            b"<< /Type /Page /Parent "
            + str(pages_root).encode()
            + b" 0 R /MediaBox [0 0 "
            + f"{page_w:g} {page_h:g}".encode()
            + b"] /Contents "
            + str(content).encode()
            + b" 0 R /Resources << /Font << /F1 "
            + str(font).encode()
            + b" 0 R >> "
            + xobj_res
            + b">> >>"
        )
        kids.append(page)
    b.set(
        pages_root,
        b"<< /Type /Pages /Count "
        + str(len(kids)).encode()
        + b" /Kids ["
        + b" ".join(f"{k} 0 R".encode() for k in kids)
        + b"] >>",
    )
    outline_ref = b""
    if outline:
        # /Outlines tree from (level, title, page_idx) rows — levels
        # nest by the nearest shallower predecessor (ISO 32000-1 §12.3.3)
        o_root = b.add(b"")
        item_ids = [b.add(b"") for _ in outline]
        parents: list[int] = []
        for i, (lv, _t, _p) in enumerate(outline):
            par = o_root
            for j in range(i - 1, -1, -1):
                if outline[j][0] == lv - 1:
                    par = item_ids[j]
                    break
                if outline[j][0] < lv - 1:
                    break
            parents.append(par)
        for i, (lv, title, pidx) in enumerate(outline):
            sibs = [k for k in range(len(outline)) if parents[k] == parents[i]]
            at = sibs.index(i)
            prev_r = (
                f"/Prev {item_ids[sibs[at-1]]} 0 R ".encode() if at > 0 else b""
            )
            next_r = (
                f"/Next {item_ids[sibs[at+1]]} 0 R ".encode()
                if at + 1 < len(sibs) else b""
            )
            children = [k for k in range(len(outline)) if parents[k] == item_ids[i]]
            kid_r = (
                f"/First {item_ids[children[0]]} 0 R /Last "
                f"{item_ids[children[-1]]} 0 R /Count {len(children)} ".encode()
                if children else b""
            )
            b.set(
                item_ids[i],
                b"<< /Title (" + _esc(title) + b") /Parent "
                + str(parents[i]).encode() + b" 0 R /Dest ["
                + str(kids[pidx]).encode() + b" 0 R /Fit] "
                + prev_r + next_r + kid_r + b">>",
            )
        top = [k for k in range(len(outline)) if parents[k] == o_root]
        b.set(
            o_root,
            b"<< /Type /Outlines /First " + str(item_ids[top[0]]).encode()
            + b" 0 R /Last " + str(item_ids[top[-1]]).encode()
            + b" 0 R /Count " + str(len(outline)).encode() + b" >>",
        )
        outline_ref = b" /Outlines " + str(o_root).encode() + b" 0 R"
    catalog = b.add(
        b"<< /Type /Catalog /Pages " + str(pages_root).encode() + b" 0 R"
        + outline_ref + b" >>"
    )
    info_obj = None
    if info:
        body = b"<<"
        for k, v in info.items():
            body += b" /" + k.encode("ascii") + b" (" + _esc(v) + b")"
        info_obj = b.add(body + b" >>")
    return b.render(catalog, use_objstm=use_objstm, info=info_obj)


def article_items(
    title: str,
    paragraphs: list[str],
    *,
    page_number: int | None = None,
    footnote: str | None = None,
) -> list[dict]:
    """The article layout as positioned text items — shared by the text
    writer (`make_article_pdf`) and the scanned-image writer
    (`sources/scangen.py`), so a scanned page and its text twin carry
    the same geometry."""
    items = [{"text": title, "x": 72, "y": 60, "size": 21}]
    y = 110
    for i, p in enumerate(paragraphs):
        words, line, lines = p.split(), "", []
        for w in words:
            if len(line) + len(w) + 1 > 80:
                lines.append(line)
                line = w
            else:
                line = (line + " " + w).strip()
        if line:
            lines.append(line)
        for j, ln in enumerate(lines):
            items.append({"text": ln, "x": 72, "y": y, "size": 12, "tj": (i + j) % 3 == 0})
            y += 14
        y += 12  # paragraph gap
    if footnote:
        items.append({"text": footnote, "x": 72, "y": 705, "size": 8})
    if page_number is not None:
        items.append({"text": str(page_number), "x": 300, "y": 745, "size": 9})
    return items


def make_article_pdf(
    title: str,
    paragraphs: list[str],
    *,
    page_number: int | None = None,
    footnote: str | None = None,
    use_objstm: bool = False,
    use_tm: bool = False,
    use_cid: bool = False,
    use_form_xobj: bool = False,
    use_lzw: bool = False,
    use_rle: bool = False,
    ascii_wrap: str | None = None,
    dct_image: bool = False,
    compress: bool = True,
) -> bytes:
    """One-page article layout: heading (large font), body paragraphs
    (12 pt, wrapped at 80 chars), optional small-font footnote at the
    bottom and a centered page number — the shapes the role classifier
    (heading / para / footnote / pageno) must recover."""
    items = article_items(
        title, paragraphs, page_number=page_number, footnote=footnote
    )
    return make_pdf(
        [items], use_objstm=use_objstm, use_tm=use_tm, use_cid=use_cid,
        use_form_xobj=use_form_xobj, use_lzw=use_lzw, use_rle=use_rle,
        ascii_wrap=ascii_wrap, dct_image=dct_image, compress=compress,
    )


# ---------------------------------------------------------------------------
# Standard-security-handler ENCRYPTOR (fixture side, ISO 32000-1 §7.6)
# ---------------------------------------------------------------------------
# Deliberately independent of stages/pdf.py's decryptor (own RC4, own pad
# constant) so a round-trip test cannot pass through a shared bug.
_ENC_PAD = bytes.fromhex(
    "28bf4e5e4e758a41640 04e56fffa01082e2e00b6d0683e802f0ca9fe6453697a".replace(" ", "")
)


def _enc_rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _rebuild_encrypted(
    pdf: bytes, transform, enc_dict: bytes, file_id: bytes, *, permissions: int = -4
) -> bytes:
    """Re-emit a classic-xref PDF with every stream payload run through
    ``transform(num, gen, payload)`` (length may change — /Length values
    are rewritten), append the /Encrypt object, and rebuild xref +
    trailer with /Encrypt + /ID.  Offsets are tracked during emission,
    never re-scanned (binary ciphertext can contain 'N G obj')."""
    import re as _re

    xref_at = pdf.rfind(b"\nxref\n")
    assert xref_at >= 0, "fixture encryptors expect the classic-xref layout"
    src = pdf[: xref_at + 1]
    tail = pdf[xref_at + 1 :]
    root = int(_re.search(rb"/Root\s+(\d+)\s+\d+\s+R", tail).group(1))
    first = _re.search(rb"\d+\s+\d+\s+obj\b", src)
    out = bytearray(src[: first.start()])
    offsets: dict[int, int] = {}
    max_num = 0
    cursor = 0
    for m in _re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", src):
        if m.start() < cursor:
            continue  # digits inside a previous object's binary stream
        num, gen = int(m.group(1)), int(m.group(2))
        max_num = max(max_num, num)
        endobj = src.find(b"endobj", m.end())
        cursor = endobj + 6
        span = src[m.end() : endobj]
        offsets[num] = len(out)
        sm = _re.search(rb"stream\r?\n", span)
        if not sm:
            out += src[m.start() : endobj + 6] + b"\n"
            continue
        dict_part = span[: sm.start()]
        payload = span[sm.end() : span.rfind(b"endstream")]
        while payload[-1:] in (b"\n", b"\r"):
            payload = payload[:-1]
        new_payload = transform(num, gen, bytes(payload))
        new_dict = _re.sub(
            rb"/Length\s+\d+", b"/Length " + str(len(new_payload)).encode(), dict_part
        )
        out += (
            src[m.start() : m.end()]
            + new_dict.rstrip()
            + b"\nstream\n"
            + new_payload
            + b"\nendstream\nendobj\n"
        )
    enc_num = max_num + 1
    offsets[enc_num] = len(out)
    out += f"{enc_num} 0 obj\n".encode() + enc_dict + b"\nendobj\n"
    size = max(offsets) + 1
    xref_pos = len(out)
    out += f"xref\n0 {size}\n".encode() + b"0000000000 65535 f \n"
    for i in range(1, size):
        out += f"{offsets.get(i, 0):010d} 00000 n \n".encode()
    idhex = file_id.hex().encode()
    out += (
        b"trailer\n<< /Size " + str(size).encode()
        + b" /Root " + str(root).encode() + b" 0 R"
        + b" /Encrypt " + str(enc_num).encode() + b" 0 R"
        + b" /ID [<" + idhex + b"> <" + idhex + b">] >>\nstartxref\n"
        + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def _legacy_keys(file_id: bytes, revision: int, permissions: int) -> tuple[bytes, bytes, bytes]:
    """Algorithms 3/2/4/5 for empty owner+user passwords -> (O, U, key).
    revision 2 -> 40-bit, revision 3/4 -> 128-bit."""
    import hashlib

    n = 5 if revision == 2 else 16
    okey = hashlib.md5(_ENC_PAD).digest()
    if revision >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey[:n]).digest()
    okey = okey[:n]
    o_val = _enc_rc4(okey, _ENC_PAD)
    if revision >= 3:
        for i in range(1, 20):
            o_val = _enc_rc4(bytes(b ^ i for b in okey), o_val)
    h = hashlib.md5()
    h.update(_ENC_PAD)
    h.update(o_val)
    h.update((permissions & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(file_id)
    key = h.digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    if revision == 2:
        u_val = _enc_rc4(key, _ENC_PAD)
    else:
        x = _enc_rc4(key, hashlib.md5(_ENC_PAD + file_id).digest())
        for i in range(1, 20):
            x = _enc_rc4(bytes(b ^ i for b in key), x)
        u_val = x + b"\x00" * 16
    return o_val, u_val, key


def encrypt_pdf_rc4(pdf: bytes, *, revision: int = 2, permissions: int = -4) -> bytes:
    """Standard security handler, EMPTY passwords, RC4: revision=2 ->
    V1/40-bit, revision=3 -> V2/128-bit (ISO 32000-1 §7.6.3 alg 2-5;
    independent of stages/pdf.py's decryptor — own RC4 + pad constant)."""
    import hashlib

    assert revision in (2, 3)
    n = 5 if revision == 2 else 16
    file_id = hashlib.md5(pdf).digest()
    o_val, u_val, key = _legacy_keys(file_id, revision, permissions)

    def transform(num: int, gen: int, payload: bytes) -> bytes:
        ok = hashlib.md5(
            key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        ).digest()[: min(n + 5, 16)]
        return _enc_rc4(ok, payload)

    v = 1 if revision == 2 else 2
    enc_dict = (
        f"<< /Filter /Standard /V {v} /R {revision} /Length {n * 8} "
        f"/P {permissions} ".encode()
        + b"/O <" + o_val.hex().encode() + b"> /U <" + u_val.hex().encode() + b"> >>"
    )
    return _rebuild_encrypted(pdf, transform, enc_dict, file_id, permissions=permissions)


def encrypt_pdf_aes128(pdf: bytes, *, permissions: int = -4) -> bytes:
    """V4 R4 /CFM /AESV2: 128-bit key (R3-style derivation), per-object
    md5(key + num + gen + "sAlT") keys, 16-byte IV prefix + AES-CBC with
    PKCS#7 padding.  Uses the vendored FIPS-197 core (KAT-pinned)."""
    import hashlib

    file_id = hashlib.md5(pdf).digest()
    o_val, u_val, key = _legacy_keys(file_id, 4, permissions)

    def transform(num: int, gen: int, payload: bytes) -> bytes:
        ok = hashlib.md5(
            key + num.to_bytes(3, "little") + gen.to_bytes(2, "little") + b"sAlT"
        ).digest()[:16]
        iv = hashlib.md5(b"iv" + num.to_bytes(4, "big") + file_id).digest()
        return iv + aes_cbc_encrypt(ok, iv, pkcs7_pad(payload))

    enc_dict = (
        f"<< /Filter /Standard /V 4 /R 4 /Length 128 /P {permissions} ".encode()
        + b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF "
        + b"/O <" + o_val.hex().encode() + b"> /U <" + u_val.hex().encode() + b"> >>"
    )
    return _rebuild_encrypted(pdf, transform, enc_dict, file_id, permissions=permissions)


def _enc_hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B, re-derived INDEPENDENTLY of the
    decryptor's implementation (stages/pdf._hash_r6) so the AES-256
    round-trip test cannot pass through a shared coding slip: the digest
    selector here is the true 128-bit big-endian integer mod 3 (the
    decryptor uses the byte-sum shortcut), and the loop/termination is
    written from the spec text rather than mirrored.  Only the AES block
    primitive is shared — it is pinned by FIPS-197 known-answer tests."""
    import hashlib

    digests = (hashlib.sha256, hashlib.sha384, hashlib.sha512)
    k = hashlib.sha256(password + salt + udata).digest()
    rounds = 0
    while True:
        e = aes_cbc_encrypt(k[:16], k[16:32], (password + k + udata) * 64)
        k = digests[int.from_bytes(e[:16], "big") % 3](e).digest()
        rounds += 1
        if rounds >= 64 and e[-1] <= rounds - 32:
            return k[:32]


def encrypt_pdf_aes256(pdf: bytes, *, permissions: int = -4) -> bytes:
    """V5 R6 /CFM /AESV3: one 256-bit file key for every stream, wrapped
    into /UE (and /OE) via the ISO 32000-2 Algorithm 2.B hardened hash
    with empty passwords; streams are IV + AES-256-CBC + PKCS#7."""
    import hashlib

    _hash_r6 = _enc_hash_r6

    file_id = hashlib.md5(pdf).digest()
    file_key = hashlib.sha256(pdf + b"filekey").digest()
    vsalt = hashlib.md5(pdf + b"vs").digest()[:8]
    ksalt = hashlib.md5(pdf + b"ks").digest()[:8]
    u_val = _hash_r6(b"", vsalt) + vsalt + ksalt
    ue = aes_cbc_encrypt(_hash_r6(b"", ksalt), b"\x00" * 16, file_key)
    ovs = hashlib.md5(pdf + b"ovs").digest()[:8]
    oks = hashlib.md5(pdf + b"oks").digest()[:8]
    o_val = _hash_r6(b"", ovs, u_val) + ovs + oks
    oe = aes_cbc_encrypt(_hash_r6(b"", oks, u_val), b"\x00" * 16, file_key)
    perms_blob = aes_ecb_encrypt(
        file_key,
        (permissions & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff" + b"Tadb" + b"\x00" * 4,
    )

    def transform(num: int, gen: int, payload: bytes) -> bytes:
        iv = hashlib.md5(b"iv" + num.to_bytes(4, "big") + file_id).digest()
        return iv + aes_cbc_encrypt(file_key, iv, pkcs7_pad(payload))

    enc_dict = (
        f"<< /Filter /Standard /V 5 /R 6 /Length 256 /P {permissions} ".encode()
        + b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF "
        + b"/O <" + o_val.hex().encode() + b"> /U <" + u_val.hex().encode() + b"> "
        + b"/OE <" + oe.hex().encode() + b"> /UE <" + ue.hex().encode() + b"> "
        + b"/Perms <" + perms_blob.hex().encode() + b"> >>"
    )
    return _rebuild_encrypted(pdf, transform, enc_dict, file_id, permissions=permissions)
