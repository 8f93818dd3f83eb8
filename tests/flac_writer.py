"""Minimal FLAC *encoder* — the independent test fixture generator for the
native decoder (native/flac.cc). Produces spec-conformant streams covering
every decoder path: CONSTANT / VERBATIM / FIXED / LPC subframes, 4- and
5-bit Rice residual partitions with raw escapes, wasted bits, the four
stereo assignments, fixed + variable blocking, multi-byte UTF-8 frame
numbers, and 8/16/24-bit depths. Written from the FLAC format spec with no
shared code with the decoder, so a bit-exact round trip is meaningful
evidence of correctness."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        assert nbits >= 0 and 0 <= value < (1 << nbits) if nbits else value == 0
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index)."""
    if n < 1 << 7:
        return bytes([n])
    for n_extra, lead_bits, lead_mask in (
            (1, 5, 0xC0), (2, 4, 0xE0), (3, 3, 0xF0),
            (4, 2, 0xF8), (5, 1, 0xFC), (6, 0, 0xFE)):
        if n < 1 << (6 * n_extra + lead_bits):
            out = [lead_mask | (n >> (6 * n_extra))]
            for i in range(n_extra - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError(f"number too large for FLAC UTF-8 coding: {n}")


FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _write_residual(bw: BitWriter, residual: Sequence[int], order: int,
                    block_size: int, partition_order: int = 0,
                    rice2: bool = False, escape_partitions=()):
    plen = 5 if rice2 else 4
    escape = 0x1F if rice2 else 0xF
    bw.write(1 if rice2 else 0, 2)
    bw.write(partition_order, 4)
    partitions = 1 << partition_order
    psize = block_size >> partition_order
    idx = 0
    for p in range(partitions):
        count = psize - (order if p == 0 else 0)
        part = residual[idx: idx + count]
        idx += count
        if p in escape_partitions:
            raw_bits = max((int(v).bit_length() + 1 for v in part), default=1)
            raw_bits = min(raw_bits, 31)
            bw.write(escape, plen)
            bw.write(raw_bits, 5)
            for v in part:
                bw.write_signed(v, raw_bits)
            continue
        # pick a sane rice parameter from the mean magnitude
        mean = max(1, int(np.mean([abs(int(v)) for v in part])) if part
                   else 1)
        param = min(max(mean.bit_length(), 1), escape - 1)
        bw.write(param, plen)
        for v in part:
            u = _zigzag(int(v))
            bw.write_unary(u >> param)
            bw.write(u & ((1 << param) - 1), param)


def _write_subframe(bw: BitWriter, samples: np.ndarray, bps: int,
                    mode: str, wasted: int = 0,
                    partition_order: int = 0, rice2: bool = False,
                    escape_partitions=(), lpc_order: int = 2,
                    lpc_shift: int = 2):
    n = len(samples)
    x = [int(v) for v in samples]
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in x)
        x = [v >> wasted for v in x]
    eff_bps = bps - wasted

    bw.write(0, 1)  # pad
    if mode == "constant":
        assert len(set(x)) == 1
        bw.write(0, 6)
        _write_wasted(bw, wasted)
        bw.write_signed(x[0], eff_bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        _write_wasted(bw, wasted)
        for v in x:
            bw.write_signed(v, eff_bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(8 + order, 6)
        _write_wasted(bw, wasted)
        for v in x[:order]:
            bw.write_signed(v, eff_bps)
        coefs = FIXED_COEFS[order]
        residual = [x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
                    for i in range(order, n)]
        _write_residual(bw, residual, order, n, partition_order, rice2,
                        escape_partitions)
    elif mode == "lpc":
        order = lpc_order
        bw.write(32 + order - 1, 6)
        _write_wasted(bw, wasted)
        for v in x[:order]:
            bw.write_signed(v, eff_bps)
        rng = np.random.default_rng(order * 7 + lpc_shift)
        prec = 12
        coefs = [int(c) for c in rng.integers(-(1 << 10), 1 << 10, order)]
        coefs[0] = max(coefs[0], 1)
        bw.write(prec - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        residual = [x[i] - (sum(c * x[i - 1 - j]
                                for j, c in enumerate(coefs)) >> lpc_shift)
                    for i in range(order, n)]
        _write_residual(bw, residual, order, n, partition_order, rice2,
                        escape_partitions)
    else:
        raise ValueError(mode)


def _write_wasted(bw: BitWriter, wasted: int):
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


def encode_flac(
    samples: np.ndarray,           # (channels, n) int at the given depth
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    subframe_mode: str = "fixed2",
    stereo_mode: str = "independent",  # left_side | right_side | mid_side
    variable_blocking: bool = False,
    partition_order: int = 0,
    rice2: bool = False,
    escape_partitions=(),
    wasted: int = 0,
    declare_total: bool = True,
) -> bytes:
    samples = np.atleast_2d(np.asarray(samples, dtype=np.int64))
    channels, total = samples.shape

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total if declare_total else 0, 36)
    si_bytes = si.getvalue() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    frame_no = 0
    pos = 0
    while pos < total:
        n = min(block_size, total - pos)
        block = samples[:, pos: pos + n]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(1 if variable_blocking else 0, 1)
        bw.write(7, 4)   # 16-bit blocksize-1 field follows
        bw.write(13, 4)  # 16-bit sample-rate field follows (in Hz)
        if channels == 2 and stereo_mode != "independent":
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[
                stereo_mode]
        else:
            ch_code = channels - 1
        bw.write(ch_code, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        number = pos if variable_blocking else frame_no
        for b in utf8_number(number):
            bw.write(b, 8)
        bw.write(n - 1, 16)
        bw.write(sample_rate, 16)
        header = bw
        # CRC-8 over the header bytes so far
        header.align()
        hdr_bytes = bytes(header.bytes)
        header.write(crc8(hdr_bytes), 8)

        if channels == 2 and stereo_mode != "independent":
            left = block[0]
            right = block[1]
            side = left - right
            if stereo_mode == "left_side":
                chans = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bps + 1), (right, bps)]
            else:
                mid = (left + right) >> 1
                chans = [(mid, bps), (side, bps + 1)]
        else:
            chans = [(block[c], bps) for c in range(channels)]

        for data_c, bps_c in chans:
            _write_subframe(header, data_c, bps_c, subframe_mode,
                            wasted=wasted, partition_order=partition_order,
                            rice2=rice2, escape_partitions=escape_partitions)
        header.align()
        frame_bytes = bytes(header.bytes)
        header.write(crc16(frame_bytes), 16)
        out += header.getvalue()
        pos += n
        frame_no += 1
    return bytes(out)
