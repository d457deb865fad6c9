"""Per-(sample, target, region) BAM scan producing bundles.

Re-implements meta/generator.{h,cc}: seek to the region's recorded virtual
offset, stream records with the reference's filters (unmapped / secondary /
cigar count / quality / span / consecutive duplicates), split into '+' and
'-' bundle streams on >= min_bundle_gap coverage gaps, route unstranded
unspliced reads to both strands, and finalize bundles (flush splices, skip
splice-free bundles when configured).
"""

from __future__ import annotations

from ..constants import UNSTRANDED
from ..core.hits import Hit
from ..io.bam import FSECONDARY, FUNMAP
from ..io.bam_native import open_bam
from .bundle import Bundle


class Generator:
    def __init__(self, sp, vcb, cfg, target_id, region_id):
        self.sp = sp
        self.vcb = vcb
        self.cfg = cfg
        self.target_id = target_id
        self.region_id = region_id
        self.index = 0

    def resolve(self):
        """meta/generator.cc:51-201"""
        sp = self.sp
        cfg = self.cfg
        tid = self.target_id
        rid = self.region_id
        if tid < 0 or rid < 0:
            return
        end1 = sp.end1[tid][rid]
        offt = sp.start_off[tid][rid]

        from ..core.bundle import BundleBase
        bb1 = BundleBase()
        bb2 = BundleBase()
        hid = 0
        pre_lpos = pre_rpos = -1

        with open_bam(sp.align_file) as r:
            r.seek(offt)
            while True:
                rec = r.read_rec()
                if rec is None:
                    break
                if rec.pos >= end1:
                    break
                if rec.tid != tid:
                    break
                if rec.flag & FUNMAP:
                    continue
                if (rec.flag & FSECONDARY) and not cfg.use_second_alignment:
                    continue
                if rec.n_cigar > cfg.max_num_cigar:
                    continue
                if rec.mapq < cfg.min_mapping_quality:
                    continue
                if rec.n_cigar < 1:
                    continue
                ht = Hit(rec, hid)
                hid += 1
                if abs(ht.pos - ht.rpos) >= cfg.max_read_span:
                    continue
                if (rec.flag & 0x8) == 0 and abs(ht.pos - ht.mpos) >= cfg.max_read_span:
                    continue
                if ht.pos == pre_lpos and ht.rpos == pre_rpos:
                    continue
                pre_lpos, pre_rpos = ht.pos, ht.rpos
                ht.set_strand(sp.library_type)

                # truncate on gaps
                if bb1.hits and (ht.tid != bb1.tid or ht.pos > bb1.rpos + cfg.min_bundle_gap):
                    self._generate(bb1)
                    bb1 = BundleBase()
                if bb2.hits and (ht.tid != bb2.tid or ht.pos > bb2.rpos + cfg.min_bundle_gap):
                    self._generate(bb2)
                    bb2 = BundleBase()

                if cfg.uniquely_mapped_only and ht.nh != 1:
                    continue
                lt = sp.library_type
                if lt != UNSTRANDED and ht.strand == "+" and ht.xs == "-":
                    continue
                if lt != UNSTRANDED and ht.strand == "-" and ht.xs == "+":
                    continue
                if lt != UNSTRANDED and ht.strand == "." and ht.xs != ".":
                    ht.strand = ht.xs
                if lt != UNSTRANDED:
                    if ht.strand == "+":
                        bb1.add_hit_intervals(ht, rec)
                    if ht.strand == "-":
                        bb2.add_hit_intervals(ht, rec)
                else:
                    if ht.xs == "+":
                        bb1.add_hit_intervals(ht, rec)
                    elif ht.xs == "-":
                        bb2.add_hit_intervals(ht, rec)
                    elif not rec.contain_splices():
                        bb1.add_hit_intervals(ht, rec)
                        bb2.add_hit_intervals(ht, rec)

        self._generate(bb1)
        self._generate(bb2)

    def _generate(self, bb):
        """meta/generator.cc:203-227"""
        if bb.tid < 0:
            return
        bb.chrm = self.sp.target_names[bb.tid]
        bb.splices = bb.hcst.get_splices()
        if self.cfg.skip_single_exon_transcripts and len(bb.splices) <= 0:
            return
        bd = Bundle(self.cfg, self.sp, bb)
        bd.gid = "gene.%d.%d" % (self.sp.sample_id, self.index)
        bd.compute_strand(self.sp.library_type)
        self.vcb.append(bd)
        self.index += 1
