// Native BAM/BGZF batch decoder for aletsch-tpu.
//
// Replaces the htslib usage of the reference (hit construction,
// rnacore/hit.cc; region-seeked scans, meta/generator.cc) with a small
// zlib-based decoder exposed through a C ABI consumed via ctypes.  Records
// decode in batches into flat arrays: fixed int32 fields per record plus
// packed cigar and qname pools, so the Python side does no byte-level
// parsing on the hot path.
//
// Virtual offsets follow the BGZF convention (coffset << 16 | uoffset).
//
// Build: g++ -O2 -shared -fPIC -o libabam.so abam.cpp -lz

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct Target {
    std::string name;
    int64_t len;
};

struct BamFile {
    FILE* fp = nullptr;
    // current decompressed block
    std::vector<uint8_t> buf;
    size_t pos = 0;            // cursor within buf
    int64_t block_start = 0;   // compressed offset of current block
    bool eof = false;
    std::vector<Target> targets;
    std::string text;
    std::vector<uint8_t> scratch;
};

bool load_block(BamFile* f) {
    f->block_start = ftello(f->fp);
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f->fp) < 12) { f->buf.clear(); f->pos = 0; f->eof = true; return false; }
    if (hdr[0] != 0x1f || hdr[1] != 0x8b) { f->eof = true; return false; }
    uint16_t xlen = hdr[10] | (hdr[11] << 8);
    std::vector<uint8_t> extra(xlen);
    if (fread(extra.data(), 1, xlen, f->fp) < xlen) { f->eof = true; return false; }
    int bsize = -1;
    for (size_t i = 0; i + 4 <= extra.size();) {
        uint8_t si1 = extra[i], si2 = extra[i + 1];
        uint16_t slen = extra[i + 2] | (extra[i + 3] << 8);
        if (si1 == 0x42 && si2 == 0x43 && slen == 2)
            bsize = (extra[i + 4] | (extra[i + 5] << 8)) + 1;
        i += 4 + slen;
    }
    if (bsize < 0) { f->eof = true; return false; }
    int cdata_len = bsize - 12 - xlen - 8;
    f->scratch.resize(cdata_len > 0 ? cdata_len : 0);
    if (cdata_len > 0 && (int)fread(f->scratch.data(), 1, cdata_len, f->fp) < cdata_len) {
        f->eof = true; return false;
    }
    uint8_t tail[8];
    if (fread(tail, 1, 8, f->fp) < 8) { f->eof = true; return false; }
    uint32_t isize = tail[4] | (tail[5] << 8) | (tail[6] << 16) | ((uint32_t)tail[7] << 24);
    f->buf.resize(isize);
    f->pos = 0;
    if (isize == 0) return true;   // EOF marker block: keep reading next
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    inflateInit2(&zs, -15);
    zs.next_in = f->scratch.data();
    zs.avail_in = cdata_len;
    zs.next_out = f->buf.data();
    zs.avail_out = isize;
    int r = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (r != Z_STREAM_END) { f->eof = true; return false; }
    return true;
}

// read n bytes across blocks; returns bytes read
size_t bread(BamFile* f, uint8_t* out, size_t n) {
    size_t got = 0;
    while (got < n) {
        if (f->pos >= f->buf.size()) {
            if (f->eof || !load_block(f)) break;
            if (f->buf.empty()) {
                // zero-length block (EOF marker); try next, stop at file end
                if (feof(f->fp)) break;
                continue;
            }
        }
        size_t take = f->buf.size() - f->pos;
        if (take > n - got) take = n - got;
        memcpy(out + got, f->buf.data() + f->pos, take);
        f->pos += take;
        got += take;
    }
    return got;
}

int32_t rd32(const uint8_t* p) {
    int32_t v;
    memcpy(&v, p, 4);
    return v;
}

}  // namespace

extern "C" {

BamFile* abam_open(const char* path) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return nullptr;
    BamFile* f = new BamFile();
    f->fp = fp;
    if (!load_block(f)) { delete f; fclose(fp); return nullptr; }
    uint8_t magic[4];
    if (bread(f, magic, 4) < 4 || memcmp(magic, "BAM\x01", 4) != 0) {
        fclose(fp); delete f; return nullptr;
    }
    uint8_t b4[4];
    bread(f, b4, 4);
    int32_t l_text = rd32(b4);
    f->text.resize(l_text);
    bread(f, (uint8_t*)f->text.data(), l_text);
    bread(f, b4, 4);
    int32_t n_ref = rd32(b4);
    for (int i = 0; i < n_ref; i++) {
        bread(f, b4, 4);
        int32_t l_name = rd32(b4);
        std::string nm(l_name, '\0');
        bread(f, (uint8_t*)nm.data(), l_name);
        nm.resize(l_name - 1);
        bread(f, b4, 4);
        Target t;
        t.name = nm;
        t.len = rd32(b4);
        f->targets.push_back(t);
    }
    return f;
}

void abam_close(BamFile* f) {
    if (!f) return;
    if (f->fp) fclose(f->fp);
    delete f;
}

int abam_ntargets(BamFile* f) { return (int)f->targets.size(); }

int abam_target_name(BamFile* f, int i, char* out, int cap) {
    const std::string& s = f->targets[i].name;
    int n = (int)s.size() < cap - 1 ? (int)s.size() : cap - 1;
    memcpy(out, s.data(), n);
    out[n] = 0;
    return (int)s.size();
}

int64_t abam_target_len(BamFile* f, int i) { return f->targets[i].len; }

uint64_t abam_tell(BamFile* f) {
    if (f->pos >= f->buf.size()) return ((uint64_t)ftello(f->fp)) << 16;
    return (((uint64_t)f->block_start) << 16) | (uint64_t)f->pos;
}

int abam_seek(BamFile* f, uint64_t voff) {
    int64_t coff = (int64_t)(voff >> 16);
    size_t uoff = (size_t)(voff & 0xFFFF);
    f->eof = false;
    if (fseeko(f->fp, coff, SEEK_SET) != 0) return -1;
    if (!load_block(f)) return -1;
    f->pos = uoff;
    return 0;
}

// fixed layout (per record, 24 int32):
// 0 tid, 1 pos, 2 rpos, 3 mapq, 4 flag, 5 mtid, 6 mpos, 7 isize,
// 8 n_cigar, 9 cigar_off, 10 qname_off, 11 qname_len, 12 xs, 13 hi,
// 14 nh, 15 nm, 16 n_splice, 17 coords_off, 18 m_cnt (match-interval
// pairs), 19 s_cnt (splice coords), 20 i_cnt (indel-interval pairs),
// 21..23 reserved.
//
// coords pool layout per record (int32): m_cnt*2 match-interval bounds,
// then s_cnt splice coordinates (interior N ops), then i_cnt*2
// indel-interval bounds (I -> [p-1,p+1), D -> [s,p)), matching
// hit::extract_splices / bundle_base::add_intervals.
int abam_read_batch(BamFile* f, int maxn, int32_t* fixed, uint64_t* voffs,
                    uint32_t* cigars, int64_t cig_cap,
                    char* qnames, int64_t q_cap,
                    int32_t* coords, int64_t coords_cap) {
    static const int CONSUME_REF =
        (1 << 0) | (1 << 2) | (1 << 3) | (1 << 7) | (1 << 8);
    int count = 0;
    int64_t cig_off = 0;
    int64_t q_off = 0;
    int64_t c_off = 0;
    std::vector<uint8_t> rec;
    while (count < maxn) {
        uint64_t voff = abam_tell(f);
        uint8_t b4[4];
        if (bread(f, b4, 4) < 4) break;
        int32_t block_size = rd32(b4);
        if (block_size <= 0) break;
        rec.resize(block_size);
        if ((int)bread(f, rec.data(), block_size) < block_size) break;
        const uint8_t* p = rec.data();
        int32_t refID = rd32(p + 0);
        int32_t pos = rd32(p + 4);
        uint8_t l_read_name = p[8];
        uint8_t mapq = p[9];
        uint16_t n_cigar = p[12] | (p[13] << 8);
        uint16_t flag = p[14] | (p[15] << 8);
        int32_t l_seq = rd32(p + 16);
        int32_t next_refID = rd32(p + 20);
        int32_t next_pos = rd32(p + 24);
        int32_t tlen = rd32(p + 28);
        size_t off = 32;
        // capacity check (coords worst case: 5 slots per cigar op)
        if (q_off + l_read_name >= q_cap || cig_off + n_cigar > cig_cap ||
            c_off + 5ll * n_cigar + 4 > coords_cap) {
            // rewind to record start and stop this batch
            abam_seek(f, voff);
            break;
        }
        int32_t* fx = fixed + (int64_t)count * 24;
        voffs[count] = voff;
        fx[0] = refID;
        fx[1] = pos;
        fx[3] = mapq;
        fx[4] = flag;
        fx[5] = next_refID;
        fx[6] = next_pos;
        fx[7] = tlen;
        fx[8] = n_cigar;
        fx[9] = (int32_t)cig_off;
        fx[10] = (int32_t)q_off;
        fx[11] = l_read_name - 1;
        memcpy(qnames + q_off, p + off, l_read_name - 1);
        qnames[q_off + l_read_name - 1] = 0;
        q_off += l_read_name;
        off += l_read_name;
        int32_t ref_len = 0;
        int32_t total_n_ops = 0;
        for (int k = 0; k < n_cigar; k++) {
            uint32_t c;
            memcpy(&c, p + off + 4 * k, 4);
            cigars[cig_off + k] = c;
            int op = c & 0xF;
            if (op == 3) total_n_ops++;
            if ((CONSUME_REF >> op) & 1) ref_len += (int32_t)(c >> 4);
        }
        // second walk: match intervals, interior splices, indel intervals
        {
            int32_t gp = pos;
            int32_t m_cnt = 0, s_cnt = 0, i_cnt = 0;
            int64_t mbase = c_off;
            // match intervals first
            for (int k = 0; k < n_cigar; k++) {
                uint32_t c = cigars[cig_off + k];
                int op = c & 0xF;
                int32_t ln = (int32_t)(c >> 4);
                if ((CONSUME_REF >> op) & 1) gp += ln;
                if (op == 0) {  // CMATCH
                    coords[mbase + 2 * m_cnt] = gp - ln;
                    coords[mbase + 2 * m_cnt + 1] = gp;
                    m_cnt++;
                }
            }
            int64_t sbase = mbase + 2 * m_cnt;
            gp = pos;
            for (int k = 0; k < n_cigar; k++) {
                uint32_t c = cigars[cig_off + k];
                int op = c & 0xF;
                int32_t ln = (int32_t)(c >> 4);
                if ((CONSUME_REF >> op) & 1) gp += ln;
                if (k == 0 || k == n_cigar - 1) continue;
                if (op != 3) continue;  // CREF_SKIP
                coords[sbase + s_cnt] = gp - ln;
                coords[sbase + s_cnt + 1] = gp;
                s_cnt += 2;
            }
            int64_t ibase = sbase + s_cnt;
            gp = pos;
            for (int k = 0; k < n_cigar; k++) {
                uint32_t c = cigars[cig_off + k];
                int op = c & 0xF;
                int32_t ln = (int32_t)(c >> 4);
                if ((CONSUME_REF >> op) & 1) gp += ln;
                if (op == 1) {  // CINS
                    coords[ibase + 2 * i_cnt] = gp - 1;
                    coords[ibase + 2 * i_cnt + 1] = gp + 1;
                    i_cnt++;
                } else if (op == 2) {  // CDEL
                    coords[ibase + 2 * i_cnt] = gp - ln;
                    coords[ibase + 2 * i_cnt + 1] = gp;
                    i_cnt++;
                }
            }
            fx[16] = s_cnt / 2;
            fx[17] = (int32_t)mbase;
            fx[18] = m_cnt;
            fx[19] = s_cnt;
            fx[20] = i_cnt;
            fx[21] = total_n_ops;
            c_off = ibase + 2 * i_cnt;
        }
        cig_off += n_cigar;
        off += 4ull * n_cigar;
        fx[2] = pos + ref_len;
        off += (l_seq + 1) / 2 + l_seq;
        // aux tags
        int32_t xs = '.', ts = '.', hi = -1, nh = -1, nm = 0;
        while (off + 3 <= (size_t)block_size) {
            char t0 = (char)p[off], t1 = (char)p[off + 1];
            char typ = (char)p[off + 2];
            off += 3;
            int64_t val = 0;
            bool have = false;
            switch (typ) {
                case 'A': val = p[off]; off += 1; have = true; break;
                case 'c': val = (int8_t)p[off]; off += 1; have = true; break;
                case 'C': val = p[off]; off += 1; have = true; break;
                case 's': { int16_t v; memcpy(&v, p + off, 2); val = v; off += 2; have = true; break; }
                case 'S': { uint16_t v; memcpy(&v, p + off, 2); val = v; off += 2; have = true; break; }
                case 'i': { int32_t v; memcpy(&v, p + off, 4); val = v; off += 4; have = true; break; }
                case 'I': { uint32_t v; memcpy(&v, p + off, 4); val = v; off += 4; have = true; break; }
                case 'f': off += 4; break;
                case 'Z': case 'H': {
                    while (off < (size_t)block_size && p[off] != 0) off++;
                    off++;
                    break;
                }
                case 'B': {
                    char sub = (char)p[off];
                    int32_t cnt; memcpy(&cnt, p + off + 1, 4);
                    int sz = (sub == 'c' || sub == 'C') ? 1 :
                             (sub == 's' || sub == 'S') ? 2 : 4;
                    off += 5 + (int64_t)cnt * sz;
                    break;
                }
                default: off = block_size; break;
            }
            if (!have) continue;
            if (t0 == 'X' && t1 == 'S' && typ == 'A') xs = (int32_t)val;
            else if (t0 == 't' && t1 == 's' && typ == 'A') ts = (int32_t)val;
            else if (t0 == 'H' && t1 == 'I') hi = (int32_t)val;
            else if (t0 == 'N' && t1 == 'H') nh = (int32_t)val;
            else if ((t0 == 'N' || t0 == 'n') && (t1 == 'M' || t1 == 'm')) nm = (int32_t)val;
        }
        // ts -> xs conversion (rnacore/hit.cc:116-123)
        if (xs == '.' && ts != '.') {
            bool rev = (flag & 0x10) != 0;
            if (ts == '+') xs = rev ? '-' : '+';
            else if (ts == '-') xs = rev ? '+' : '-';
        }
        fx[12] = xs;
        fx[13] = hi;
        fx[14] = nh;
        fx[15] = nm;
        count++;
    }
    return count;
}

}  // extern "C"
