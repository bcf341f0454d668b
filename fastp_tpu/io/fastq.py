"""Host-side FASTQ streaming reader / writer.

Replicates the reference reader's record semantics
(reference: src/fastqreader.cpp:219-347):
  * lines end at \n, \r, or \r\n
  * a record's name line must start with '@'; empty/non-@ lines before a
    name are skipped
  * a missing/invalid '+' strand line or a seq/qual length mismatch prints a
    warning and ends the stream (treated as EOF)
Gzip input is streamed with zlib (multi-member supported); output gzip uses
zlib with the configured compression level.

This is the correctness-first pure-Python path; the C++ native tokenizer in
fastp_tpu/native is used automatically when built (see io/native.py).
"""
from __future__ import annotations

import sys
import zlib
from typing import Iterator, List, Optional, Tuple

import numpy as np

CHUNK = 1 << 23  # 8MB, mirrors FQ_BUF_SIZE


class Record:
    __slots__ = ("name", "seq", "strand", "qual")

    def __init__(self, name: bytes, seq: bytes, strand: bytes, qual: bytes):
        self.name = name
        self.seq = seq
        self.strand = strand
        self.qual = qual


def _open_stream(filename: str):
    if filename == "/dev/stdin" or filename == "-":
        return sys.stdin.buffer, False
    return open(filename, "rb"), filename.endswith(".gz")


class FastqReader:
    """Streaming FASTQ line reader with reference-compatible semantics."""

    def __init__(self, filename: str, phred64: bool = False):
        self.filename = filename
        self.phred64 = phred64
        self._fh, self._zipped = _open_stream(filename)
        self._decomp = zlib.decompressobj(wzbits := 16 + 15) if self._zipped else None
        self._lines: List[bytes] = []
        self._lidx = 0
        self._tail = b""
        self._eof = False
        self._stopped = False
        self.bytes_read = 0  # compressed/file bytes consumed

    def _fill(self) -> bool:
        """Read the next chunk and split into lines. Returns False at EOF."""
        while True:
            raw = self._fh.read(CHUNK)
            if not raw:
                if self._zipped and self._decomp is not None:
                    data = self._decomp.flush()
                else:
                    data = b""
                self._eof = True
                buf = self._tail + data
                self._tail = b""
                if not buf:
                    return False
                lines = self._normalize(buf).split(b"\n")
                self._lines = lines
                self._lidx = 0
                return True
            self.bytes_read += len(raw)
            if self._zipped:
                data = self._decomp.decompress(raw)
                # multi-member gzip: restart on leftover
                while self._decomp.eof and self._decomp.unused_data:
                    leftover = self._decomp.unused_data
                    self._decomp = zlib.decompressobj(16 + 15)
                    data += self._decomp.decompress(leftover)
            else:
                data = raw
            buf = self._tail + data
            if not buf:
                continue
            norm = self._normalize(buf)
            lines = norm.split(b"\n")
            self._tail = lines.pop()  # possibly partial last line
            if not lines:
                continue
            self._lines = lines
            self._lidx = 0
            return True

    @staticmethod
    def _normalize(buf: bytes) -> bytes:
        if b"\r" in buf:
            buf = buf.replace(b"\r\n", b"\n").replace(b"\r", b"\n")
        return buf

    def _next_line(self) -> Optional[bytes]:
        while self._lidx >= len(self._lines):
            if self._eof:
                return None
            if not self._fill():
                return None
        line = self._lines[self._lidx]
        self._lidx += 1
        return line

    def read(self) -> Optional[Record]:
        """One record, or None at EOF / on malformed input (like the reference)."""
        if self._stopped:
            return None
        name = self._next_line()
        # skip empty / non-@ lines before the name
        while name is not None and (len(name) == 0 or name[0:1] != b"@"):
            name = self._next_line()
        if name is None or len(name) == 0:
            return None
        seq = self._next_line()
        strand = self._next_line()
        qual = self._next_line()
        if seq is None or strand is None or qual is None:
            self._stopped = True
            return None
        if len(strand) == 0 or strand[0:1] != b"+":
            sys.stderr.write(name.decode("latin-1") + "\n")
            sys.stderr.write("Expected '+', got %s\n" % strand.decode("latin-1"))
            sys.stderr.write("Your FASTQ may be invalid, please check the tail of your FASTQ file\n")
            self._stopped = True
            return None
        if len(qual) != len(seq):
            sys.stderr.write("ERROR: sequence and quality have different length:\n")
            for x in (name, seq, strand, qual):
                sys.stderr.write(x.decode("latin-1") + "\n")
            sys.stderr.write("Your FASTQ may be invalid, please check the tail of your FASTQ file\n")
            self._stopped = True
            return None
        if self.phred64:
            q = np.frombuffer(qual, dtype=np.uint8).astype(np.int16) - 31
            qual = np.maximum(q, 33).astype(np.uint8).tobytes()
        return Record(name, seq, strand, qual)

    def read_batch(self, n: int) -> List[Record]:
        out = []
        for _ in range(n):
            r = self.read()
            if r is None:
                break
            out.append(r)
        return out

    def close(self):
        if self._fh is not sys.stdin.buffer:
            self._fh.close()


def encode_batch(records: List[Record], width: int,
                 pre_trim: Optional[np.ndarray] = None):
    """Pack records into padded (bases, quals, lengths) uint8/int32 arrays.

    Reads longer than `width` raise (caller sizes width from the evaluator).
    """
    B = len(records)
    bases = np.zeros((B, width), np.uint8)
    quals = np.zeros((B, width), np.uint8)
    lengths = np.zeros((B,), np.int32)
    for i, r in enumerate(records):
        s = r.seq
        n = len(s)
        if n > width:
            raise ValueError("read length %d exceeds batch width %d" % (n, width))
        bases[i, :n] = np.frombuffer(s, np.uint8)
        quals[i, :n] = np.frombuffer(r.qual, np.uint8)
        lengths[i] = n
    return bases, quals, lengths


class OutputWriter:
    """Buffered plain/gzip writer (reference: src/writer.cpp:98-133)."""

    def __init__(self, filename: str, compression: int = 4, to_stdout: bool = False,
                 buffer_size: int = 1 << 22):
        self.filename = filename
        self._stdout = to_stdout
        self._zipped = filename.endswith(".gz") and not to_stdout
        self._fh = sys.stdout.buffer if to_stdout else open(filename, "wb")
        self._level = compression
        self._buf: List[bytes] = []
        self._buflen = 0
        self._bufsize = buffer_size

    def write(self, data: bytes):
        if not data:
            return
        self._buf.append(data)
        self._buflen += len(data)
        if self._buflen >= self._bufsize:
            self.flush()

    def flush(self):
        if not self._buf:
            return
        blob = b"".join(self._buf)
        self._buf = []
        self._buflen = 0
        if self._zipped:
            # one gzip member per flushed buffer, like the libdeflate writer
            co = zlib.compressobj(self._level, zlib.DEFLATED, 16 + 15)
            self._fh.write(co.compress(blob))
            self._fh.write(co.flush())
        else:
            self._fh.write(blob)

    def close(self):
        self.flush()
        if not self._stdout:
            self._fh.close()
        else:
            self._fh.flush()


def serialize_records(names: List[bytes], seqs: List[bytes], strands: List[bytes],
                      quals: List[bytes]) -> bytes:
    parts = []
    for i in range(len(names)):
        parts.append(names[i])
        parts.append(b"\n")
        parts.append(seqs[i])
        parts.append(b"\n")
        parts.append(strands[i])
        parts.append(b"\n")
        parts.append(quals[i])
        parts.append(b"\n")
    return b"".join(parts)
