// fastpcd: native point-cloud loading + preprocessing for the host pipeline.
//
// The reference leans on pypcd + numpy inside torch DataLoader workers
// (opencood/utils/pcd_utils.py) — the throughput bottleneck on a small host.
// This C++ core does the hot host-side work in one pass per cloud:
//   * parse a binary/ascii PCD file (x, y, z, intensity subset),
//   * drop NaNs and points on the carrier (|x|,|y| < ego_mask),
//   * apply a 4x4 rigid transform (project into the ego frame),
//   * axis-aligned range crop,
//   * fill a caller-provided fixed-capacity buffer (padded contract).
//
// Exposed as a C ABI consumed from Python via ctypes
// (airv2x_tpu/data/native.py); no pybind11 dependency.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfastpcd.so fastpcd.cpp

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Header {
  std::vector<std::string> fields;
  std::vector<int> sizes;
  std::vector<char> types;
  std::vector<int> counts;
  long points = 0;
  bool binary = false;
  long data_offset = 0;
};

bool parse_header(FILE* f, Header* h) {
  char line[4096];
  while (fgets(line, sizeof(line), f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.empty() || s[0] == '#') continue;
    auto sp = s.find(' ');
    if (sp == std::string::npos) continue;
    std::string key = s.substr(0, sp);
    std::string val = s.substr(sp + 1);
    auto split = [](const std::string& v) {
      std::vector<std::string> out;
      size_t i = 0;
      while (i < v.size()) {
        size_t j = v.find(' ', i);
        if (j == std::string::npos) j = v.size();
        if (j > i) out.push_back(v.substr(i, j - i));
        i = j + 1;
      }
      return out;
    };
    if (key == "FIELDS") {
      h->fields = split(val);
    } else if (key == "SIZE") {
      for (auto& t : split(val)) h->sizes.push_back(atoi(t.c_str()));
    } else if (key == "TYPE") {
      for (auto& t : split(val)) h->types.push_back(t[0]);
    } else if (key == "COUNT") {
      for (auto& t : split(val)) h->counts.push_back(atoi(t.c_str()));
    } else if (key == "POINTS") {
      h->points = atol(val.c_str());
    } else if (key == "DATA") {
      h->binary = (val == "binary");
      h->data_offset = ftell(f);
      if (h->counts.empty()) h->counts.assign(h->fields.size(), 1);
      return !h->fields.empty() && h->points >= 0;
    }
  }
  return false;
}

}  // namespace

extern "C" {

// Load a PCD file into out[n_cap * 4] (x, y, z, intensity rows).
// If transform16 != nullptr, applies the row-major 4x4 rigid transform.
// Range: [xmin ymin zmin xmax ymax zmax]; pass nullptr to skip cropping.
// ego_mask: drop points with |x|<ego_mask && |y|<ego_mask pre-transform
// (0 disables). Returns the number of points written, or -1 on error.
long fastpcd_load(const char* path, float* out, long n_cap,
                  const float* transform16, const float* range6,
                  float ego_mask) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Header h;
  if (!parse_header(f, &h)) {
    fclose(f);
    return -1;
  }

  // locate x/y/z/intensity byte offsets within a record
  long stride = 0;
  long off_x = -1, off_y = -1, off_z = -1, off_i = -1;
  char type_x = 'F';
  for (size_t k = 0; k < h.fields.size(); ++k) {
    long field_bytes = (long)h.sizes[k] * h.counts[k];
    if (h.fields[k] == "x") off_x = stride, type_x = h.types[k];
    else if (h.fields[k] == "y") off_y = stride;
    else if (h.fields[k] == "z") off_z = stride;
    else if (h.fields[k] == "intensity") off_i = stride;
    stride += field_bytes;
  }
  if (off_x < 0 || off_y < 0 || off_z < 0 || type_x != 'F') {
    fclose(f);
    return -1;
  }

  long written = 0;
  const float* T = transform16;
  const float* R = range6;

  auto emit = [&](float x, float y, float z, float inten) {
    if (std::isnan(x) || std::isnan(y) || std::isnan(z)) return;
    if (ego_mask > 0 && std::fabs(x) < ego_mask && std::fabs(y) < ego_mask)
      return;
    if (T) {
      float tx = T[0] * x + T[1] * y + T[2] * z + T[3];
      float ty = T[4] * x + T[5] * y + T[6] * z + T[7];
      float tz = T[8] * x + T[9] * y + T[10] * z + T[11];
      x = tx; y = ty; z = tz;
    }
    if (R) {
      if (x <= R[0] || x >= R[3] || y <= R[1] || y >= R[4] || z <= R[2] ||
          z >= R[5])
        return;
    }
    if (written < n_cap) {
      float* row = out + written * 4;
      row[0] = x; row[1] = y; row[2] = z; row[3] = inten;
      ++written;
    }
  };

  if (h.binary) {
    std::vector<unsigned char> buf((size_t)h.points * stride);
    size_t got = fread(buf.data(), 1, buf.size(), f);
    long n = (long)(got / stride);
    for (long i = 0; i < n; ++i) {
      const unsigned char* rec = buf.data() + (size_t)i * stride;
      float x, y, z, inten = 1.0f;
      memcpy(&x, rec + off_x, 4);
      memcpy(&y, rec + off_y, 4);
      memcpy(&z, rec + off_z, 4);
      if (off_i >= 0) memcpy(&inten, rec + off_i, 4);
      emit(x, y, z, inten);
    }
  } else {
    // ascii: column indices of the target fields
    int col = 0, cx = -1, cy = -1, cz = -1, ci = -1;
    for (size_t k = 0; k < h.fields.size(); ++k) {
      if (h.fields[k] == "x") cx = col;
      else if (h.fields[k] == "y") cy = col;
      else if (h.fields[k] == "z") cz = col;
      else if (h.fields[k] == "intensity") ci = col;
      col += h.counts[k];
    }
    int ncols = col;
    std::vector<double> vals(ncols);
    char line[8192];
    for (long i = 0; i < h.points && fgets(line, sizeof(line), f); ++i) {
      char* p = line;
      int c = 0;
      while (c < ncols && *p) {
        while (*p && isspace((unsigned char)*p)) ++p;
        if (!*p) break;
        vals[c++] = strtod(p, &p);
      }
      if (c < ncols) continue;
      float inten = ci >= 0 ? (float)vals[ci] : 1.0f;
      emit((float)vals[cx], (float)vals[cy], (float)vals[cz], inten);
    }
  }
  fclose(f);
  return written;
}

}  // extern "C"
