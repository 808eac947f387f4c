// Fast msgpack snapshot codec — the native data-loader.
//
// Reference parity: the reference loads snapshots through nlohmann-json's
// C++ msgpack parser (src/nerf_render.cu:83-88) — a native code path. The
// pure-Python msgpack loader turns the ~10M-float `params` and
// `density_grid` arrays into millions of PyFloat objects; this codec
// parses the msgpack stream in C++ and exposes the big numeric arrays as
// raw float buffers (zero Python objects), plus byte offsets so Python
// can decode the small config remainder itself.
//
// Exposed via ctypes (no pybind11 in this image):
//   snapshot_scan(buf, len, out_meta) -> 0 on success
//     out_meta: int64[N_FIELDS] — for each known field of the top-level
//     "snapshot" map: element count, value-bytes offset, element kind.
//   snapshot_read_f32(buf, len, offset, count, kind, out) — decode `count`
//     msgpack numbers starting at `offset` into out[count] floats.
//
// Build: see build_native.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cstdio>

namespace {

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint8_t peek() { return ok && p < end ? *p : (ok = false, 0); }
  uint8_t u8() { return ok && p < end ? *p++ : (ok = false, 0); }
  uint64_t be(int n) {
    if (!ok || p + n > end) { ok = false; return 0; }
    uint64_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 8) | *p++;
    return v;
  }
  void skip_bytes(uint64_t n) {
    if (!ok || p + n > end) { ok = false; return; }
    p += n;
  }
};

// Returns element count for array/map headers; for str/bin returns byte
// length via *blen. kind: 0 scalar, 1 str/bin, 2 array, 3 map.
int header(Cursor& c, uint64_t* count, uint64_t* blen) {
  uint8_t t = c.u8();
  *count = 0; *blen = 0;
  if (t <= 0x7f || t >= 0xe0) return 0;               // fixint
  if ((t & 0xf0) == 0x80) { *count = t & 0x0f; return 3; }  // fixmap
  if ((t & 0xf0) == 0x90) { *count = t & 0x0f; return 2; }  // fixarray
  if ((t & 0xe0) == 0xa0) { *blen = t & 0x1f; return 1; }   // fixstr
  switch (t) {
    case 0xc0: case 0xc2: case 0xc3: return 0;        // nil/bool
    case 0xc4: *blen = c.be(1); return 1;             // bin8
    case 0xc5: *blen = c.be(2); return 1;
    case 0xc6: *blen = c.be(4); return 1;
    case 0xc7: *blen = c.be(1) + 1; return 1;         // ext8
    case 0xc8: *blen = c.be(2) + 1; return 1;
    case 0xc9: *blen = c.be(4) + 1; return 1;
    case 0xca: *blen = 4; return 4;                   // f32 payload
    case 0xcb: *blen = 8; return 4;                   // f64 payload
    case 0xcc: *blen = 1; return 4;                   // uint8..
    case 0xcd: *blen = 2; return 4;
    case 0xce: *blen = 4; return 4;
    case 0xcf: *blen = 8; return 4;
    case 0xd0: *blen = 1; return 4;                   // int8..
    case 0xd1: *blen = 2; return 4;
    case 0xd2: *blen = 4; return 4;
    case 0xd3: *blen = 8; return 4;
    case 0xd4: *blen = 2; return 1;                   // fixext
    case 0xd5: *blen = 3; return 1;
    case 0xd6: *blen = 5; return 1;
    case 0xd7: *blen = 9; return 1;
    case 0xd8: *blen = 17; return 1;
    case 0xd9: *blen = c.be(1); return 1;             // str8..
    case 0xda: *blen = c.be(2); return 1;
    case 0xdb: *blen = c.be(4); return 1;
    case 0xdc: *count = c.be(2); return 2;            // array16/32
    case 0xdd: *count = c.be(4); return 2;
    case 0xde: *count = c.be(2); return 3;            // map16/32
    case 0xdf: *count = c.be(4); return 3;
  }
  c.ok = false;
  return -1;
}

void skip_value(Cursor& c) {
  uint64_t count, blen;
  int kind = header(c, &count, &blen);
  if (!c.ok) return;
  if (kind == 1 || kind == 4) { c.skip_bytes(blen); return; }
  if (kind == 2) { for (uint64_t i = 0; i < count && c.ok; i++) skip_value(c); return; }
  if (kind == 3) {
    for (uint64_t i = 0; i < count && c.ok; i++) { skip_value(c); skip_value(c); }
  }
}

bool read_str(Cursor& c, const char** s, uint64_t* len) {
  Cursor save = c;
  uint64_t count, blen;
  int kind = header(c, &count, &blen);
  if (kind != 1 || !c.ok) { c = save; skip_value(c); return false; }
  *s = reinterpret_cast<const char*>(c.p);
  *len = blen;
  c.skip_bytes(blen);
  return c.ok;
}

double read_number(Cursor& c) {
  if (!c.ok) return 0;
  uint8_t t = c.peek();
  if (t <= 0x7f) { return (double)c.u8(); }
  if (t >= 0xe0) { return (double)(int8_t)c.u8(); }
  c.u8();
  switch (t) {
    case 0xca: { uint32_t v = (uint32_t)c.be(4); float f; memcpy(&f, &v, 4); return f; }
    case 0xcb: { uint64_t v = c.be(8); double d; memcpy(&d, &v, 8); return d; }
    case 0xcc: return (double)c.be(1);
    case 0xcd: return (double)c.be(2);
    case 0xce: return (double)c.be(4);
    case 0xcf: return (double)c.be(8);
    case 0xd0: return (double)(int8_t)c.be(1);
    case 0xd1: return (double)(int16_t)c.be(2);
    case 0xd2: return (double)(int32_t)c.be(4);
    case 0xd3: return (double)(int64_t)c.be(8);
    case 0xc3: return 1.0;
    case 0xc2: case 0xc0: return 0.0;
  }
  c.ok = false;
  return 0;
}

// Known snapshot fields we surface (order = ctypes contract).
const char* kFields[] = {"params", "density_grid", "aabb", "bound", "scale",
                         "cascade", "density_grid_size", "mean_density"};
constexpr int kNumFields = 8;

}  // namespace

extern "C" {

// out_meta layout: for field i:
//   [5*i+0] = element count
//   [5*i+1] = byte offset of the first element (arrays) / value (scalars)
//   [5*i+2] = 1 if found else 0
//   [5*i+3] = byte offset of the value header (incl. array type byte)
//   [5*i+4] = byte offset one past the end of the value
// Returns 0 ok, nonzero on parse error.
int snapshot_scan(const uint8_t* buf, int64_t len, int64_t* out_meta) {
  Cursor c{buf, buf + len};
  for (int i = 0; i < 5 * kNumFields; i++) out_meta[i] = 0;

  uint64_t count, blen;
  int kind = header(c, &count, &blen);
  if (kind != 3 || !c.ok) return 1;  // top level must be a map

  for (uint64_t i = 0; i < count && c.ok; i++) {
    const char* key; uint64_t klen;
    if (!read_str(c, &key, &klen)) { skip_value(c); continue; }
    if (klen == 8 && memcmp(key, "snapshot", 8) == 0) {
      uint64_t scount, sblen;
      int skind = header(c, &scount, &sblen);
      if (skind != 3 || !c.ok) return 2;
      for (uint64_t j = 0; j < scount && c.ok; j++) {
        const char* skey; uint64_t sklen;
        if (!read_str(c, &skey, &sklen)) { skip_value(c); continue; }
        int fi = -1;
        for (int f = 0; f < kNumFields; f++) {
          if (sklen == strlen(kFields[f]) &&
              memcmp(skey, kFields[f], sklen) == 0) { fi = f; break; }
        }
        if (fi < 0) { skip_value(c); continue; }
        Cursor at = c;
        uint64_t acount, ablen;
        int akind = header(c, &acount, &ablen);
        if (akind == 2) {  // numeric array
          out_meta[5 * fi + 0] = (int64_t)acount;
          out_meta[5 * fi + 1] = c.p - buf;
          out_meta[5 * fi + 2] = 1;
          out_meta[5 * fi + 3] = at.p - buf;
          for (uint64_t k = 0; k < acount && c.ok; k++) skip_value(c);
          out_meta[5 * fi + 4] = c.p - buf;
        } else {           // scalar
          out_meta[5 * fi + 0] = 1;
          out_meta[5 * fi + 1] = at.p - buf;
          out_meta[5 * fi + 2] = 1;
          out_meta[5 * fi + 3] = at.p - buf;
          c = at;
          skip_value(c);
          out_meta[5 * fi + 4] = c.p - buf;
        }
      }
    } else {
      skip_value(c);
    }
  }
  return c.ok ? 0 : 3;
}

// Decode `count` consecutive msgpack numbers starting at byte `offset`.
int snapshot_read_f32(const uint8_t* buf, int64_t len, int64_t offset,
                      int64_t count, float* out) {
  Cursor c{buf + offset, buf + len};
  for (int64_t i = 0; i < count; i++) {
    out[i] = (float)read_number(c);
    if (!c.ok) return 1;
  }
  return 0;
}

int snapshot_read_f64(const uint8_t* buf, int64_t len, int64_t offset,
                      int64_t count, double* out) {
  Cursor c{buf + offset, buf + len};
  for (int64_t i = 0; i < count; i++) {
    out[i] = read_number(c);
    if (!c.ok) return 1;
  }
  return 0;
}

}  // extern "C"
