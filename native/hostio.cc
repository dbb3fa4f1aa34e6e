// hostio — native host-side I/O for the TPU SLAM engine.
//
// The counterpart of the reference's native network adapter
// (slam_backends/orb_slam_3/orbslam3_mono_networked.cc): the per-frame
// host work that sits between the socket and the accelerator —
// length-prefixed packet scanning, binary PPM decode, RGB->gray — as a
// small C ABI library consumed from Python via ctypes. At 1280x800x3
// @30 fps this is ~100 MB/s of byte shuffling; fused decode+luma does
// one pass instead of numpy's three.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

// Fixed-point BT.601 luma, matching cv2.cvtColor RGB2GRAY rounding.
inline uint8_t luma(uint8_t r, uint8_t g, uint8_t b) {
  return static_cast<uint8_t>(
      (19595u * r + 38470u * g + 7471u * b + 32768u) >> 16);
}

// Parse "P6\n<w> <h>\n<max>\n" style headers (whitespace/comments per
// the netpbm spec). Returns payload offset or -1.
long parse_ppm_header(const uint8_t* data, size_t len, int* magic, int* w,
                      int* h, int* maxval) {
  size_t i = 0;
  if (len < 2 || data[0] != 'P' || (data[1] != '5' && data[1] != '6'))
    return -1;
  *magic = data[1] - '0';
  i = 2;
  int fields[3];
  for (int f = 0; f < 3; ++f) {
    // skip whitespace + comments
    for (;;) {
      while (i < len && (data[i] == ' ' || data[i] == '\t' ||
                         data[i] == '\n' || data[i] == '\r'))
        ++i;
      if (i < len && data[i] == '#') {
        while (i < len && data[i] != '\n') ++i;
      } else {
        break;
      }
    }
    if (i >= len) return -1;
    long v = 0;
    bool any = false;
    while (i < len && data[i] >= '0' && data[i] <= '9') {
      v = v * 10 + (data[i] - '0');
      ++i;
      any = true;
    }
    if (!any) return -1;
    fields[f] = static_cast<int>(v);
  }
  if (i >= len) return -1;
  ++i;  // single whitespace after maxval
  *w = fields[0];
  *h = fields[1];
  *maxval = fields[2];
  return static_cast<long>(i);
}

}  // namespace

extern "C" {

// Decode a binary PPM(P6)/PGM(P5) straight to grayscale.
// out must hold w*h bytes (call ppm_probe first). Returns 0 on success.
int ppm_probe(const uint8_t* data, size_t len, int* w, int* h) {
  int magic, maxval;
  long off = parse_ppm_header(data, len, &magic, w, h, &maxval);
  return off < 0 ? -1 : 0;
}

int ppm_decode_gray(const uint8_t* data, size_t len, uint8_t* out,
                    int out_capacity) {
  int magic, w, h, maxval;
  long off = parse_ppm_header(data, len, &magic, &w, &h, &maxval);
  if (off < 0 || maxval != 255) return -1;
  size_t npx = static_cast<size_t>(w) * h;
  if (static_cast<size_t>(out_capacity) < npx) return -2;
  const uint8_t* p = data + off;
  if (magic == 5) {
    if (len - off < npx) return -3;
    std::memcpy(out, p, npx);
  } else {
    if (len - off < npx * 3) return -3;
    for (size_t i = 0; i < npx; ++i) {
      out[i] = luma(p[3 * i], p[3 * i + 1], p[3 * i + 2]);
    }
  }
  return 0;
}

void rgb_to_gray(const uint8_t* rgb, size_t n_px, uint8_t* gray) {
  for (size_t i = 0; i < n_px; ++i) {
    gray[i] = luma(rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]);
  }
}

// Encode (H,W) gray or (H,W,3) RGB into binary PGM/PPM. Returns bytes
// written or -1 if out_capacity too small.
long ppm_encode(const uint8_t* img, int w, int h, int channels,
                uint8_t* out, long out_capacity) {
  char header[64];
  int n = std::snprintf(header, sizeof(header), "P%d\n%d %d\n255\n",
                        channels == 3 ? 6 : 5, w, h);
  size_t body = static_cast<size_t>(w) * h * channels;
  if (static_cast<size_t>(out_capacity) < body + n) return -1;
  std::memcpy(out, header, n);
  std::memcpy(out + n, img, body);
  return static_cast<long>(n + body);
}

// Scan a byte buffer for complete 4-byte-BE length-prefixed packets
// (the reference wire framing, slam_handler.ex:114-123). Fills
// offsets[i]/lengths[i] for each complete packet body; *consumed is
// the number of bytes covered by complete packets (the caller keeps
// the tail). Returns the packet count, or -1 if a length field
// exceeds max_packet_len (protocol violation / 50 MB guard).
int extract_packets(const uint8_t* buf, size_t len, size_t* offsets,
                    size_t* lengths, int max_packets,
                    size_t max_packet_len, size_t* consumed) {
  size_t pos = 0;
  int count = 0;
  while (count < max_packets && pos + 4 <= len) {
    size_t plen = (static_cast<size_t>(buf[pos]) << 24) |
                  (static_cast<size_t>(buf[pos + 1]) << 16) |
                  (static_cast<size_t>(buf[pos + 2]) << 8) |
                  static_cast<size_t>(buf[pos + 3]);
    if (plen > max_packet_len) return -1;
    if (pos + 4 + plen > len) break;
    offsets[count] = pos + 4;
    lengths[count] = plen;
    ++count;
    pos += 4 + plen;
  }
  *consumed = pos;
  return count;
}

}  // extern "C"
