import io
import os

from aletsch_tpu.io.bam import (BamReader, BamWriter, CREF_SKIP, parse_cigar)
from aletsch_tpu.io.bgzf import BgzfReader, BgzfWriter
from aletsch_tpu.io.gtf import Transcript, read_gtf


def test_bgzf_roundtrip(tmp_path):
    p = tmp_path / "x.bgzf"
    data = bytes(range(256)) * 1000
    with BgzfWriter(str(p), block_size=4096) as w:
        w.write(data)
    with BgzfReader(str(p)) as r:
        assert r.read(len(data)) == data
        assert r.read(10) == b""


def test_bgzf_virtual_offsets(tmp_path):
    p = tmp_path / "x.bgzf"
    with BgzfWriter(str(p), block_size=100) as w:
        for i in range(50):
            w.write(bytes([i]) * 37)
    r = BgzfReader(str(p))
    offs = []
    vals = []
    for _ in range(30):
        offs.append(r.tell())
        vals.append(r.read(37))
    # seek back to an arbitrary record
    r.seek(offs[17])
    assert r.read(37) == vals[17]
    r.seek(offs[3])
    assert r.read(37) == vals[3]
    r.close()


def test_bam_roundtrip(tmp_path):
    p = tmp_path / "t.bam"
    with BamWriter(str(p), ["chr1", "chr2"], [1000000, 500000]) as w:
        w.write_rec("read1", 99, 0, 1000, 60, "50M200N50M",
                    mtid=0, mpos=1500, isize=800, xs="+", nh=1)
        w.write_rec("read2", 147, 0, 1500, 60, "100M",
                    mtid=0, mpos=1000, isize=-800, nh=1)
    with BamReader(str(p)) as r:
        assert r.header.names == ["chr1", "chr2"]
        assert r.header.lengths == [1000000, 500000]
        a = r.read_rec()
        assert a.qname == "read1"
        assert a.pos == 1000 and a.rpos == 1000 + 50 + 200 + 50
        assert a.extract_splices() == [1050, 1250]
        assert a.xs == "+" and a.nh == 1
        assert a.match_intervals() == [(1000, 1050), (1250, 1300)]
        b = r.read_rec()
        assert b.qname == "read2" and b.pos == 1500 and b.isize == -800
        assert r.read_rec() is None


def test_bam_seek(tmp_path):
    p = tmp_path / "t.bam"
    with BamWriter(str(p), ["chr1"], [10**7]) as w:
        for i in range(500):
            w.write_rec("r%d" % i, 0, 0, 100 * i, 60, "100M")
    r = BamReader(str(p))
    offs = []
    names = []
    while True:
        o = r.tell()
        rec = r.read_rec()
        if rec is None:
            break
        offs.append(o)
        names.append(rec.qname)
    assert len(names) == 500
    r.seek(offs[321])
    assert r.read_rec().qname == names[321]
    r.close()


def test_gtf_write_and_read(tmp_path):
    t = Transcript(seqname="chr1", source="aletsch", gene_id="g1",
                   transcript_id="t1", strand="+", coverage=3.14159)
    t.add_exon(100, 200)
    t.add_exon(300, 400)
    buf = io.StringIO()
    t.write(buf, cov2=1.5, count=2)
    s = buf.getvalue()
    lines = s.strip().split("\n")
    assert len(lines) == 3
    assert lines[0].startswith("chr1\taletsch\ttranscript\t101\t400\t1000\t+\t.\t")
    assert 'cov "3.1416"; cov2 "1.5000"; count "2"; ' in lines[0]
    assert "\texon\t101\t200\t" in lines[1]

    p = tmp_path / "x.gtf"
    p.write_text(s)
    back = read_gtf(str(p))
    assert len(back) == 1
    assert back[0].exons == [(100, 200), (300, 400)]
    assert back[0].strand == "+"


def test_transcript_compare():
    a = Transcript(seqname="chr1", strand="+")
    a.exons = [(0, 100), (200, 300)]
    b = Transcript(seqname="chr1", strand="+")
    b.exons = [(10, 100), (200, 290)]
    assert a.intron_chain_match(b)
    assert a.compare1(b, 0.8) == 0
    c = Transcript(seqname="chr1", strand="+")
    c.exons = [(10, 100), (210, 290)]
    assert not a.intron_chain_match(c)
    assert a.compare1(c, 0.8) != 0


def test_feature_row_width():
    t = Transcript(transcript_id="t", meta_tid="m", seqname="chr1")
    buf = io.StringIO()
    t.write_features(buf)
    assert len(buf.getvalue().strip("\n").split("\t")) == 51
