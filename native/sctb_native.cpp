// Native host-side runtime kernels for samcarriestheburden_tpu.
//
// The reference consumes native fast paths through third-party libraries
// (OpenCV connectedComponentsWithStats in segment_anything/utils/amg.py:279,
// pycocotools RLE).  These are the framework's own implementations, exposed
// through a C ABI and loaded via ctypes — no build-time Python dependency.
//
// Build:  g++ -O3 -march=native -shared -fPIC sctb_native.cpp -o libsctb_native.so

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Run-length encoding (pycocotools uncompressed format, column-major order;
// semantics of segment_anything/utils/amg.py:107-135)
// ---------------------------------------------------------------------------

// Encode one H×W row-major boolean mask into alternating run lengths starting
// with a background run (possibly 0).  Scans in Fortran (column-major) order.
// Returns the number of runs written, or -1 if `cap` was too small.
int rle_encode_fortran(const uint8_t* mask, int h, int w,
                       int32_t* out, int cap) {
    int n_runs = 0;
    uint8_t current = 0;  // runs start with background
    int32_t run = 0;
    for (int x = 0; x < w; ++x) {
        const uint8_t* col = mask + x;
        for (int y = 0; y < h; ++y) {
            uint8_t v = col[(size_t)y * w] != 0;
            if (v == current) {
                ++run;
            } else {
                if (n_runs >= cap) return -1;
                out[n_runs++] = run;
                current = v;
                run = 1;
            }
        }
    }
    if (n_runs >= cap) return -1;
    out[n_runs++] = run;
    return n_runs;
}

// Decode alternating run lengths back into a row-major H×W mask.
void rle_decode_fortran(const int32_t* counts, int n_counts, int h, int w,
                        uint8_t* mask_out) {
    uint8_t value = 0;
    size_t idx = 0;
    const size_t total = (size_t)h * w;
    std::vector<uint8_t> fortran(total);
    for (int i = 0; i < n_counts; ++i) {
        int32_t run = counts[i];
        for (int32_t j = 0; j < run && idx < total; ++j) fortran[idx++] = value;
        value = !value;
    }
    // fortran[k] is (y = k % h, x = k / h)
    for (int x = 0; x < w; ++x)
        for (int y = 0; y < h; ++y)
            mask_out[(size_t)y * w + x] = fortran[(size_t)x * h + y];
}

// ---------------------------------------------------------------------------
// Connected components (8-connectivity), two-pass union-find.
// Replaces cv2.connectedComponentsWithStats in the AMG small-region
// postprocess (reference amg.py:267-291).
// ---------------------------------------------------------------------------

static int32_t uf_find(std::vector<int32_t>& parent, int32_t x) {
    while (parent[x] != x) {
        parent[x] = parent[parent[x]];
        x = parent[x];
    }
    return x;
}

static void uf_union(std::vector<int32_t>& parent, int32_t a, int32_t b) {
    a = uf_find(parent, a);
    b = uf_find(parent, b);
    if (a == b) return;
    if (a > b) std::swap(a, b);
    parent[b] = a;  // smaller root wins -> stable first-seen ordering
}

// Labels foreground 8-connected components 1..n (0 = background) and writes
// per-label pixel areas into `areas` (areas[0] = background count).
// Returns n + 1 (number of labels incl. background), or -1 if more than
// `max_labels` labels would be needed.
int connected_components_8(const uint8_t* mask, int h, int w,
                           int32_t* labels_out, int32_t* areas_out,
                           int max_labels) {
    const size_t total = (size_t)h * w;
    std::vector<int32_t> parent;
    parent.reserve(1024);
    parent.push_back(0);  // background id

    std::vector<int32_t> raw((size_t)h * w, 0);
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            size_t i = (size_t)y * w + x;
            if (!mask[i]) continue;
            int32_t up = (y > 0) ? raw[i - w] : 0;
            int32_t upl = (y > 0 && x > 0) ? raw[i - w - 1] : 0;
            int32_t upr = (y > 0 && x + 1 < w) ? raw[i - w + 1] : 0;
            int32_t left = (x > 0) ? raw[i - 1] : 0;
            int32_t neigh[4] = {up, upl, upr, left};
            int32_t lbl = 0;
            for (int k = 0; k < 4; ++k)
                if (neigh[k] && (lbl == 0 || neigh[k] < lbl)) lbl = neigh[k];
            if (lbl == 0) {
                lbl = (int32_t)parent.size();
                parent.push_back(lbl);
            } else {
                for (int k = 0; k < 4; ++k)
                    if (neigh[k] && neigh[k] != lbl) uf_union(parent, lbl, neigh[k]);
            }
            raw[i] = lbl;
        }
    }

    // flatten + densify labels
    std::vector<int32_t> dense(parent.size(), -1);
    int32_t next = 1;
    for (size_t i = 0; i < total; ++i) {
        if (!raw[i]) { labels_out[i] = 0; continue; }
        int32_t root = uf_find(parent, raw[i]);
        if (dense[root] == -1) {
            if (next >= max_labels) return -1;
            dense[root] = next++;
        }
        labels_out[i] = dense[root];
    }
    for (int32_t l = 0; l < next; ++l) areas_out[l] = 0;
    for (size_t i = 0; i < total; ++i) ++areas_out[labels_out[i]];
    return next;
}

}  // extern "C"
