import pytest

from aletsch_tpu.io.bam import BamReader
from aletsch_tpu.io.bam_native import NativeBamReader, native_available
from simulate import simulate_sample

FIELDS = ("tid", "pos", "rpos", "mapq", "flag", "mtid", "mpos", "isize",
          "qname", "cigar", "xs", "hi", "nh", "nm")


@pytest.mark.skipif(not native_available(), reason="libabam build unavailable")
def test_native_parity(tmp_path):
    p = str(tmp_path / "t.bam")
    simulate_sample(p, seed=11)
    a = BamReader(p)
    b = NativeBamReader(p)
    assert a.header.names == b.header.names
    assert a.header.lengths == b.header.lengths
    offs = []
    n = 0
    while True:
        oa, ob = a.tell(), b.tell()
        ra, rb = a.read_rec(), b.read_rec()
        if ra is None or rb is None:
            assert ra is None and rb is None
            break
        assert oa == ob
        for f in FIELDS:
            assert getattr(ra, f) == getattr(rb, f), f
        offs.append((oa, ra.qname))
        n += 1
    assert n > 100
    a.close()
    # seek parity
    for k in (0, n // 2, n - 1):
        b.seek(offs[k][0])
        assert b.read_rec().qname == offs[k][1]
    b.close()
