// Native UFP packing: expand -> greedy merge -> factor -> strip pack.
//
// Semantics mirror glsdet_tpu/ufp/packing.py exactly (which re-derives the
// reference behavior of yolox-ufp/mmdet/core/ufp/unified_foreground_packing.py
// and spp.py).  The dataset builder runs this over ~10k images per epoch of
// stage-2 training data generation; C++ removes the python interpreter from
// that loop (the device never sees this code — mosaic pixels are assembled
// on-TPU).
//
// C ABI:
//   int ufp_pack(const double* boxes, int n, double scale,
//                double img_w, double img_h,
//                double width_min, double width_max,
//                double* out_regions /* capacity n*7 */,
//                double* out_wh /* 2 */);
// Returns the number of packed regions (rows of out_regions:
// [x1, y1, w, h, new_x, new_y, factor]), or -1 on error.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct Box {
  double x1, y1, x2, y2;
};

constexpr int kExact = 1;
constexpr int kFullWidth = 2;
constexpr int kFullHeight = 3;
constexpr int kFits = 4;
constexpr int kNoFit = 5;

struct Packer {
  const std::vector<std::pair<double, double>>& sizes;
  std::vector<std::pair<double, double>>& placed;
  std::vector<int>& pending;  // kept sorted by the seed ordering

  std::pair<int, int> best_fit(double hole_w, double hole_h) const {
    int priority = kNoFit;
    int best = -1;
    for (int idx : pending) {
      double rw = sizes[idx].first, rh = sizes[idx].second;
      if (priority > kExact && rw == hole_w && rh == hole_h)
        return {kExact, idx};
      if (priority > kFullWidth && rw == hole_w && rh < hole_h) {
        priority = kFullWidth;
        best = idx;
      } else if (priority > kFullHeight && rw < hole_w && rh == hole_h) {
        priority = kFullHeight;
        best = idx;
      } else if (priority > kFits && rw < hole_w && rh < hole_h) {
        priority = kFits;
        best = idx;
      }
    }
    return {priority, best};
  }

  double min_pending_side() const {
    double m = std::numeric_limits<double>::infinity();
    for (int idx : pending)
      m = std::min(m, std::min(sizes[idx].first, sizes[idx].second));
    return m;
  }

  void fill_hole(double x, double y, double w, double h) {
    auto [priority, best] = best_fit(w, h);
    if (priority >= kNoFit || best < 0) return;
    double rw = sizes[best].first, rh = sizes[best].second;
    placed[best] = {x, y};
    pending.erase(std::find(pending.begin(), pending.end(), best));
    if (priority == kExact) return;
    if (priority == kFullWidth) {
      fill_hole(x, y + rh, w, h - rh);
    } else if (priority == kFullHeight) {
      fill_hole(x + rw, y, w - rw, h);
    } else {
      double min_side = min_pending_side();
      if (w - rw < min_side) {
        fill_hole(x, y + rh, w, h - rh);
      } else if (h - rh < min_side) {
        fill_hole(x + rw, y, w - rw, h);
      } else if (rw < min_side) {
        fill_hole(x + rw, y, w - rw, rh);
        fill_hole(x, y + rh, w, h - rh);
      } else {
        fill_hole(x, y + rh, rw, h - rh);
        fill_hole(x + rw, y, w - rw, h);
      }
    }
  }
};

// Placement-order keys for strip_pack (descending; stable on index to
// match python sorted()).  Mirrors packing.py _SORT_KEYS.
enum SortKey { kByWidth = 0, kByHeight = 1, kByArea = 2, kByPerim = 3 };

double sort_value(const std::pair<double, double>& s, SortKey key) {
  switch (key) {
    case kByWidth: return s.first;
    case kByHeight: return s.second;
    case kByArea: return s.first * s.second;
    default: return s.first + s.second;
  }
}

double strip_pack(double width,
                  const std::vector<std::pair<double, double>>& sizes,
                  std::vector<std::pair<double, double>>& placed,
                  SortKey key = kByHeight) {
  int n = static_cast<int>(sizes.size());
  placed.assign(n, {0.0, 0.0});
  std::vector<int> pending(n);
  for (int i = 0; i < n; ++i) pending[i] = i;
  std::stable_sort(pending.begin(), pending.end(), [&](int a, int b) {
    return sort_value(sizes[a], key) > sort_value(sizes[b], key);
  });
  Packer packer{sizes, placed, pending};
  double strip_h = 0.0;
  while (!pending.empty()) {
    int idx = pending.front();
    pending.erase(pending.begin());
    double rw = sizes[idx].first, rh = sizes[idx].second;
    placed[idx] = {0.0, strip_h};
    packer.fill_hole(rw, strip_h, width - rw, rh);
    strip_h += rh;
  }
  return strip_h;
}

// 1-3) expand -> greedy merge -> factor: the shared UFP front half.
void ufp_regions(const double* boxes, int n, double scale, double img_w,
                 double img_h, std::vector<Box>& regions,
                 std::vector<int>& factors) {
  // 1) expand about centers, clip to [0, dim-1]
  std::vector<Box> scaled(n);
  std::vector<double> area_sum(n), count(n, 1.0);
  std::vector<bool> alive(n, true);
  for (int i = 0; i < n; ++i) {
    double bx1 = boxes[i * 4 + 0], by1 = boxes[i * 4 + 1];
    double bx2 = boxes[i * 4 + 2], by2 = boxes[i * 4 + 3];
    double cx = (bx1 + bx2) * 0.5, cy = (by1 + by2) * 0.5;
    double hw = (bx2 - bx1) * 0.5 * scale, hh = (by2 - by1) * 0.5 * scale;
    auto clip = [](double v, double lo, double hi) {
      return std::max(lo, std::min(v, hi));
    };
    scaled[i] = {clip(cx - hw, 0, img_w - 1), clip(cy - hh, 0, img_h - 1),
                 clip(cx + hw, 0, img_w - 1), clip(cy + hh, 0, img_h - 1)};
    area_sum[i] = (bx2 - bx1 + 1) * (by2 - by1 + 1);
  }

  // 2) greedy merge (union area < area sum)
  for (int i = 0; i < n; ++i) {
    if (!alive[i]) continue;
    Box cur = scaled[i];
    double cur_area = (cur.x2 - cur.x1) * (cur.y2 - cur.y1);
    for (int j = 0; j < n; ++j) {
      if (j == i || !alive[j]) continue;
      const Box& o = scaled[j];
      double o_area = (o.x2 - o.x1) * (o.y2 - o.y1);
      double ux1 = std::min(cur.x1, o.x1), uy1 = std::min(cur.y1, o.y1);
      double ux2 = std::max(cur.x2, o.x2), uy2 = std::max(cur.y2, o.y2);
      double u_area = (ux2 - ux1) * (uy2 - uy1);
      if (u_area < cur_area + o_area) {
        cur = {ux1, uy1, ux2, uy2};
        cur_area = u_area;
        alive[j] = false;
        area_sum[i] += area_sum[j];
        count[i] += count[j];
      }
    }
    scaled[i] = cur;
  }

  // 3) factor from mean absorbed area
  for (int i = 0; i < n; ++i) {
    if (!alive[i]) continue;
    double mean_area = area_sum[i] / count[i];
    int f = mean_area < 32.0 * 32.0 ? 4 : (mean_area < 96.0 * 96.0 ? 2 : 1);
    regions.push_back(scaled[i]);
    factors.push_back(f);
  }
}

std::vector<std::pair<double, double>> region_sizes(
    const std::vector<Box>& regions, const std::vector<int>& factors) {
  std::vector<std::pair<double, double>> sizes(regions.size());
  for (size_t i = 0; i < regions.size(); ++i) {
    sizes[i] = {(regions[i].x2 - regions[i].x1) * factors[i],
                (regions[i].y2 - regions[i].y1) * factors[i]};
  }
  return sizes;
}

int emit_regions(const std::vector<Box>& regions,
                 const std::vector<int>& factors,
                 const std::vector<std::pair<double, double>>& sizes,
                 const std::vector<std::pair<double, double>>& placed,
                 double* out_regions, double* out_wh) {
  int r = static_cast<int>(regions.size());
  double mosaic_w = 0.0, mosaic_h = 0.0;
  for (int i = 0; i < r; ++i) {
    double rw = sizes[i].first, rh = sizes[i].second;
    double px = placed[i].first, py = placed[i].second;
    mosaic_w = std::max(mosaic_w, px + rw);
    mosaic_h = std::max(mosaic_h, py + rh);
    out_regions[i * 7 + 0] = regions[i].x1;
    out_regions[i * 7 + 1] = regions[i].y1;
    out_regions[i * 7 + 2] = regions[i].x2 - regions[i].x1;
    out_regions[i * 7 + 3] = regions[i].y2 - regions[i].y1;
    out_regions[i * 7 + 4] = px;
    out_regions[i * 7 + 5] = py;
    out_regions[i * 7 + 6] = factors[i];
  }
  out_wh[0] = mosaic_w;
  out_wh[1] = mosaic_h;
  return r;
}

// Reference packing back half: binary-search width, strip pack
// (matches python float midpoints).
void pack_reference(const std::vector<std::pair<double, double>>& sizes,
                    double width_min, double width_max,
                    std::vector<std::pair<double, double>>& placed) {
  double lo = width_min, hi = width_max;
  // (the reference also evaluates strip_pack(width_max) before the
  // search, but the loop always runs >= once and overwrites the
  // result — dead work, skipped here; outputs are identical)
  while (lo <= hi) {
    double mid = (lo + hi) / 2;
    double height = strip_pack(mid, sizes, placed);
    if (height > mid)
      lo = mid + 1;
    else
      hi = mid - 1;
  }
}

}  // namespace

extern "C" int ufp_pack(const double* boxes, int n, double scale,
                        double img_w, double img_h, double width_min,
                        double width_max, double* out_regions,
                        double* out_wh) {
  if (n <= 0) {
    out_wh[0] = out_wh[1] = 0.0;
    return 0;
  }
  std::vector<Box> regions;
  std::vector<int> factors;
  ufp_regions(boxes, n, scale, img_w, img_h, regions, factors);
  auto sizes = region_sizes(regions, factors);
  std::vector<std::pair<double, double>> placed;
  pack_reference(sizes, width_min, width_max, placed);
  return emit_regions(regions, factors, sizes, placed, out_regions, out_wh);
}

// Bucket-fit packing (packing.py pack_regions_fit twin): pack at each
// candidate square bucket width (ascending; 4 placement orders per
// bucket) and keep the first layout that fits the bucket in both
// dimensions.  Falls back to the reference binary search when nothing
// fits; *out_bucket is then -1 and the caller buckets the layout as
// usual.  Rationale: the serving canvas is a square bucket whose AREA
// sets the MP-Det forward cost, so packing into the ladder beats
// packing square-ish and rounding up.
extern "C" int ufp_pack_fit(const double* boxes, int n, double scale,
                            double img_w, double img_h,
                            const double* buckets, int n_buckets,
                            double* out_regions, double* out_wh,
                            double* out_bucket) {
  *out_bucket = -1.0;
  if (n <= 0) {
    out_wh[0] = out_wh[1] = 0.0;
    return 0;
  }
  std::vector<Box> regions;
  std::vector<int> factors;
  ufp_regions(boxes, n, scale, img_w, img_h, regions, factors);
  auto sizes = region_sizes(regions, factors);
  std::vector<std::pair<double, double>> placed;
  // FIT_SORT_ORDERS: height, area, perim, width
  const SortKey orders[4] = {kByHeight, kByArea, kByPerim, kByWidth};
  for (int bi = 0; bi < n_buckets; ++bi) {
    double b = buckets[bi];
    for (SortKey key : orders) {
      double height = strip_pack(b, sizes, placed, key);
      if (height > b) continue;
      double width = 0.0;
      for (size_t i = 0; i < sizes.size(); ++i)
        width = std::max(width, placed[i].first + sizes[i].first);
      if (width <= b) {
        *out_bucket = b;
        return emit_regions(regions, factors, sizes, placed, out_regions,
                            out_wh);
      }
    }
  }
  pack_reference(sizes, 300.0, 2666.0, placed);
  return emit_regions(regions, factors, sizes, placed, out_regions, out_wh);
}

// Bin region rows into per-canvas-tile painter entry tables (the host
// side of the pallas mosaic painter, ufp/pallas_paint.py:48 python
// twin).  rows: (R, 7) float32 [x1, y1, w, h, nx, ny, f] with integer
// values (f == 0 padding); table: (nty, ntx, cap, 8) int32, caller-
// zeroed.  Returns 1 when any tile overflows cap (caller falls back to
// the XLA painter), else 0.
extern "C" int ufp_tile_tables(const float* rows, int n_rows, int out_h,
                               int out_w, int tile, int cap, int* table) {
  const int nty = out_h / tile, ntx = out_w / tile;
  std::vector<int> counts(nty * ntx, 0);
  int overflow = 0;
  for (int r = 0; r < n_rows; ++r) {
    const float* row = rows + r * 7;
    const int x1 = (int)row[0], y1 = (int)row[1];
    const int w = (int)row[2], h = (int)row[3];
    const int nx = (int)row[4], ny = (int)row[5], f = (int)row[6];
    if (f <= 0 || w <= 0 || h <= 0) continue;
    const int j0 = std::max(nx / tile, 0), i0 = std::max(ny / tile, 0);
    const int j1 = std::min((nx + w * f - 1) / tile, ntx - 1);
    const int i1 = std::min((ny + h * f - 1) / tile, nty - 1);
    for (int i = i0; i <= i1; ++i) {
      for (int j = j0; j <= j1; ++j) {
        int& c = counts[i * ntx + j];
        if (c >= cap) {
          overflow = 1;
          continue;
        }
        int* e = table + (((i * ntx) + j) * cap + c) * 8;
        e[0] = x1; e[1] = y1; e[2] = w; e[3] = h;
        e[4] = nx; e[5] = ny; e[6] = f; e[7] = 1;
        ++c;
      }
    }
  }
  return overflow;
}
