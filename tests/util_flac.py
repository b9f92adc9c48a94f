"""Minimal FLAC *encoder* for testing the native decoder: writes STREAMINFO
plus frames with VERBATIM or FIXED-order-0 (rice) subframes — enough to
exercise the bitstream reader, rice partitions, frame sync, and scaling."""

import struct


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, bits):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.acc & 0xFF)
                self.acc = 0
                self.nbits = 0

    def write_unary(self, q):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits:
            self.write(0, 1)


def _utf8_number(bw, n):
    assert n < 128
    bw.write(n, 8)


def encode_flac(samples, sr=16000, bps=16, blocksize=4096, mode="verbatim"):
    """samples: list of ints in [-2^(bps-1), 2^(bps-1)); mono."""
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(blocksize, 16)  # min block
    si.write(blocksize, 16)  # max block
    si.write(0, 24)  # min frame size
    si.write(0, 24)  # max frame size
    si.write(sr, 20)
    si.write(0, 3)  # channels - 1
    si.write(bps - 1, 5)
    si.write(len(samples), 36)
    si.align()
    body = bytes(si.bytes) + b"\x00" * 16  # md5 zeros
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    frame_no = 0
    for start in range(0, len(samples), blocksize):
        chunk = samples[start : start + blocksize]
        bw = BitWriter()
        bw.write(0x3FFE, 14)  # sync
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # blocksize: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from streaminfo
        bw.write(0, 4)  # channels: 1 (code 0 = mono)
        bw.write(4, 3)  # sample size: 16-bit
        bw.write(0, 1)  # reserved
        _utf8_number(bw, frame_no)
        bw.write(len(chunk) - 1, 16)
        bw.write(0, 8)  # CRC-8 (decoder skips)
        # subframe
        bw.write(0, 1)  # pad
        if mode == "verbatim":
            bw.write(1, 6)  # VERBATIM
            bw.write(0, 1)  # no wasted bits
            for s in chunk:
                bw.write(s & ((1 << bps) - 1), bps)
        else:  # fixed order 0, rice-coded residual
            bw.write(8, 6)  # FIXED order 0
            bw.write(0, 1)
            bw.write(0, 2)  # rice method 0 (4-bit params)
            bw.write(0, 4)  # partition order 0
            param = 12
            bw.write(param, 4)
            for s in chunk:
                z = (s << 1) if s >= 0 else ((-s) << 1) - 1  # zigzag
                q, r = z >> param, z & ((1 << param) - 1)
                bw.write_unary(q)
                bw.write(r, param)
        bw.align()
        bw.write(0, 16)  # CRC-16 (decoder skips)
        out += bytes(bw.bytes)
        frame_no += 1
    return bytes(out)
