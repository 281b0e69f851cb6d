"""Host-side RDS stack: CRC/syndrome, Meggitt FEC, block sync, group decode."""

import numpy as np

from sdrjfm_tpu.rds import crc, encode
from sdrjfm_tpu.rds.blocksync import BlockSynchronizer, Group
from sdrjfm_tpu.rds.groups import GroupDecoder


class TestCRC:
    def test_encode_block_zero_syndrome(self):
        for name in crc.OFFSET_WORDS:
            for info in (0x0000, 0x1234, 0xFFFF, 0xA5A5):
                blk = crc.encode_block(info, name)
                assert crc.syndrome(blk, crc.OFFSET_WORDS[name]) == 0
                assert (blk >> 10) == info

    def test_single_bit_error_detected_and_corrected(self):
        blk = crc.encode_block(0xBEEF, "B")
        for pos in range(10, 26):        # payload bits
            bad = blk ^ (1 << pos)
            s = crc.syndrome(bad, crc.OFFSET_WORDS["B"])
            assert s != 0
            fixed, resid, n = crc.meggitt_correct(bad, s)
            assert resid == 0 and n == 1 and fixed == blk

    def test_burst_error_corrected(self):
        blk = crc.encode_block(0xCAFE, "D")
        bad = blk ^ (0b11111 << 15)      # 5-bit burst in the payload
        s = crc.syndrome(bad, crc.OFFSET_WORDS["D"])
        fixed, resid, n = crc.meggitt_correct(bad, s)
        assert resid == 0 and fixed == blk


class TestBlockSyncAndGroups:
    def _decode(self, bits, offset=0, flips=()):
        bits = np.asarray(bits, np.int8).copy()
        for f in flips:
            bits[f] ^= 1
        sync = BlockSynchronizer()
        dec = GroupDecoder()
        grp = Group()
        sync.push_bits(bits[offset:], grp, on_group=dec.decode)
        return sync, dec.result

    def test_clean_stream_decodes_station_and_text(self):
        bits = encode.make_bitstream(pi=0x10F0, pty=10, station="TPU FM  ",
                                     radiotext="HELLO FROM JAX\r")
        sync, res = self._decode(bits)
        assert sync.groups_decoded > 50
        assert res.pi_code == 0x10F0
        assert res.pty_code == 10
        assert res.station_label == "TPU FM  "
        assert res.radio_text == "HELLO FROM JAX"
        assert sync.bit_error_rate == 0.0

    def test_stream_with_arbitrary_bit_offset(self):
        bits = encode.make_bitstream()
        sync, res = self._decode(bits, offset=17)
        assert sync.groups_decoded > 50
        assert res.station_label == "TPU FM  "

    def test_isolated_bit_errors_are_fec_corrected(self):
        bits = encode.make_bitstream()
        # flip isolated payload bits well after sync acquisition
        flips = [1200, 2600, 4200]
        sync, res = self._decode(bits, flips=flips)
        assert res.station_label == "TPU FM  "
        assert sync.groups_decoded > 40

    def test_radiotext_ebu_charset_switches(self):
        """EBU alphabet-switch sequences in radiotext: 0x0F 0x0F (G0),
        0x0E 0x0E (G1), 0x1B 0x6E (G2) plus high-table chars, exercising
        prepareText's switch walk (rds-groupdecoder.cpp:298-343).  Expected
        output encodes the reference's quirks: after a switch the second
        marker char is emitted via the table (0x0F/0x0E -> ' ', 0x6E -> 'n')
        and the char after it is skipped ('C'/'E'/'F' vanish); 0x91 maps to
        'ä' and 0xD1 to 'Ä' (EBU E.1)."""
        pi, pty = 0x2222, 1
        text = ("AB\x0f\x0fC\x91D\x0e\x0eE\x1bnF\x91\xd1\r"
                + " " * 48)          # 16 chars -> 4 segments, then padding
        bits = []
        for _ in range(3):
            for seg in range(4):
                bits.extend(encode.group_2a(pi, pty, seg,
                                            text[4 * seg:4 * seg + 4]))
        sync, res = self._decode(bits)
        assert sync.groups_decoded >= 8
        # walk: A,B kept; 0F0F switch eats C, emits ' '; 0x91 -> 'ä'; D
        # kept; 0E0E switch eats E, emits ' '; 1B6E switch eats F, emits
        # 'n'; 0x91 0xD1 -> 'äÄ'; \r ends the text
        assert res.radio_text == "AB äD näÄ"

    def test_extended_groups_ptyn_eon_tmc(self):
        """10A/14A/8A extensions decode from a synthetic stream."""
        pi, pty = 0x10F0, 10
        bits = []
        for _ in range(4):
            for seg in range(4):
                bits.extend(encode.group_0a(pi, pty, seg,
                                            "TPU FM  "[2 * seg:2 * seg + 2]))
            for seg in range(2):
                bits.extend(encode.group_10a(pi, pty, seg,
                                             "JAZZ    "[4 * seg:4 * seg + 4]))
            for v in range(4):
                bits.extend(encode.group_14a_ps(pi, pty, 0x2222, v,
                                                "OTHER FM"[2 * v:2 * v + 2]))
            bits.extend(encode.group_14a_af(pi, pty, 0x2222, 30))  # 90.5 MHz
            bits.extend(encode.group_14a_pty_ta(pi, pty, 0x2222, 14, 1))
            bits.extend(encode.group_8a(pi, pty, event=401, location=12345,
                                        extent=2, direction=1, duration=3))
        sync, res = self._decode(bits)
        assert res.ptyn == "JAZZ    "
        assert 0x2222 in res.eon
        e = res.eon[0x2222]
        assert "".join(e["ps"]) == "OTHER FM"
        assert e["pty"] == 14 and e["ta"] is True
        assert e["af_khz"] == [90500]
        assert len(res.tmc_messages) == 1
        m = res.tmc_messages[0]
        assert m["event"] == 401 and m["location"] == 12345
        assert m["extent"] == 2 and m["direction"] == 1 and m["duration"] == 3

    def test_ps_pi_majority_voting(self):
        """A minority of corrupted 0A groups doesn't disturb the voted PS/PI."""
        from sdrjfm_tpu.rds.groups import GroupDecoder
        from sdrjfm_tpu.rds.blocksync import Group

        dec = GroupDecoder()

        def feed(pi, seg, pair):
            g = Group()
            g.set_block("A", pi)
            g.set_block("B", (0 << 12) | (10 << 5) | (1 << 3) | seg)
            g.set_block("C", 0xE0E0)
            g.set_block("D", (ord(pair[0]) << 8) | ord(pair[1]))
            dec.decode(g)

        for rep in range(5):
            for seg, pair in enumerate(["TP", "U ", "FM", "  "]):
                feed(0x10F0, seg, pair)
            if rep == 2:            # one corrupted pass: wrong char + wrong PI
                feed(0x10F0, 1, "X!")
                feed(0xDEAD, 0, "ZZ")
        # the plain label took the corrupted char then recovered on rep 3/4;
        # the voted label never wavered
        assert dec.result.station_label_voted == "TPU FM  "
        assert dec.result.pi_voted == 0x10F0
        # reference-exact label also recovered (later segments overwrote)
        assert dec.result.station_label == "TPU FM  "

    def test_differential_roundtrip(self):
        rng = np.random.default_rng(3)
        data = (rng.random(500) > 0.5).astype(np.int8)
        sym = encode.differential_encode(data, initial=1)
        prev = np.concatenate([[1], sym[:-1]])
        back = sym ^ prev
        np.testing.assert_array_equal(back, data)
