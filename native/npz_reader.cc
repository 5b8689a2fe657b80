// Minimal npz (ZIP of .npy) reader + host preprocessing + threaded prefetch.
//
// Native data plane of the framework: the reference does all preprocessing in
// DataLoader worker *processes* (main.py:160-171); here a C++ thread pool
// decodes npz samples (central-directory ZIP walk + raw-deflate via zlib +
// .npy header parse) and serves them in order, overlapping host IO/decode
// with TPU compute. Exposed through a plain C ABI consumed via ctypes
// (icpflow_tpu/data/native_loader.py) — no pybind dependency.
//
// Build: make -C native   (produces libicpflow_host.so)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Array {
  int dtype = -1;  // 0 f32, 1 f64, 2 i64, 3 i32, 4 u8/bool, 5 i8, 6 u64
  std::vector<int64_t> shape;
  std::vector<uint8_t> data;
};

struct Npz {
  std::map<std::string, Array> arrays;
  std::vector<std::string> names;
};

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}
uint64_t rd64(const uint8_t* p) {
  uint64_t v = 0;
  for (int i = 7; i >= 0; --i) v = (v << 8) | p[i];
  return v;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  bool ok = fread(out->data(), 1, n, f) == (size_t)n;
  fclose(f);
  return ok;
}

bool inflate_raw(const uint8_t* src, size_t src_len, uint8_t* dst,
                 size_t dst_len) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = src_len;
  zs.next_out = dst;
  zs.avail_out = dst_len;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END || (rc == Z_OK && zs.avail_out == 0);
}

int dtype_code(const std::string& descr) {
  if (descr.find("f4") != std::string::npos) return 0;
  if (descr.find("f8") != std::string::npos) return 1;
  if (descr.find("i8") != std::string::npos) return 2;
  if (descr.find("i4") != std::string::npos) return 3;
  // b1 (numpy bool) must stay distinct from u1: Python-side masks index
  // point arrays, and a uint8 mask silently becomes integer fancy indexing
  // (caught by tests/test_schema_fidelity.py on the AV2 valid_idx fields)
  if (descr.find("b1") != std::string::npos) return 7;
  if (descr.find("u1") != std::string::npos) return 4;
  if (descr.find("i1") != std::string::npos) return 5;
  if (descr.find("u8") != std::string::npos) return 6;
  return -1;
}

// parse one .npy buffer into Array
bool parse_npy(const uint8_t* p, size_t n, Array* out) {
  if (n < 10 || memcmp(p, "\x93NUMPY", 6) != 0) return false;
  int major = p[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = rd16(p + 8);
    hoff = 10;
  } else {
    hlen = rd32(p + 8);
    hoff = 12;
  }
  if (hoff + hlen > n) return false;
  std::string hdr(reinterpret_cast<const char*>(p + hoff), hlen);
  auto find_val = [&](const char* key) -> std::string {
    size_t k = hdr.find(key);
    if (k == std::string::npos) return "";
    k = hdr.find(':', k);
    return hdr.substr(k + 1, 64);
  };
  std::string descr = find_val("'descr'");
  out->dtype = dtype_code(descr);
  if (out->dtype < 0) return false;
  if (find_val("'fortran_order'").find("True") != std::string::npos)
    return false;  // C-order only
  size_t k = hdr.find("'shape'");
  k = hdr.find('(', k);
  size_t e = hdr.find(')', k);
  std::string shp = hdr.substr(k + 1, e - k - 1);
  out->shape.clear();
  int64_t cur = -1;
  for (char c : shp) {
    if (c >= '0' && c <= '9')
      cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    else if (cur >= 0) {
      out->shape.push_back(cur);
      cur = -1;
    }
  }
  if (cur >= 0) out->shape.push_back(cur);
  size_t itemsize[] = {4, 8, 8, 4, 1, 1, 8, 1};
  size_t total = itemsize[out->dtype];
  for (auto s : out->shape) total *= s;
  if (hoff + hlen + total > n) return false;
  out->data.assign(p + hoff + hlen, p + hoff + hlen + total);
  return true;
}

// walk the ZIP central directory (authoritative offsets/sizes)
bool parse_npz(const std::vector<uint8_t>& buf, Npz* out) {
  if (buf.size() < 22) return false;
  // find EOCD
  size_t eocd = std::string::npos;
  for (size_t i = buf.size() - 22; i + 4 >= 4; --i) {
    if (rd32(buf.data() + i) == 0x06054b50) {
      eocd = i;
      break;
    }
    if (i == 0 || buf.size() - i > 22 + 65535) break;
  }
  if (eocd == std::string::npos) return false;
  uint64_t n_entries = rd16(buf.data() + eocd + 10);
  uint64_t cd_off = rd32(buf.data() + eocd + 16);
  // zip64?
  if (cd_off == 0xFFFFFFFFu && eocd >= 20) {
    size_t loc = eocd - 20;
    if (rd32(buf.data() + loc) == 0x07064b50) {
      uint64_t z64 = rd64(buf.data() + loc + 8);
      if (z64 + 56 <= buf.size() &&
          rd32(buf.data() + z64) == 0x06064b50) {
        n_entries = rd64(buf.data() + z64 + 32);
        cd_off = rd64(buf.data() + z64 + 48);
      }
    }
  }
  size_t p = cd_off;
  for (uint64_t i = 0; i < n_entries; ++i) {
    if (p + 46 > buf.size() || rd32(buf.data() + p) != 0x02014b50)
      return false;
    uint16_t method = rd16(buf.data() + p + 10);
    uint64_t csize = rd32(buf.data() + p + 20);
    uint64_t usize = rd32(buf.data() + p + 24);
    uint16_t nlen = rd16(buf.data() + p + 28);
    uint16_t xlen = rd16(buf.data() + p + 30);
    uint16_t clen = rd16(buf.data() + p + 32);
    uint64_t lho = rd32(buf.data() + p + 42);
    std::string name(reinterpret_cast<const char*>(buf.data() + p + 46),
                     nlen);
    // zip64 extras
    const uint8_t* x = buf.data() + p + 46 + nlen;
    const uint8_t* xe = x + xlen;
    while (x + 4 <= xe) {
      uint16_t tag = rd16(x), sz = rd16(x + 2);
      if (tag == 1) {
        const uint8_t* q = x + 4;
        if (usize == 0xFFFFFFFFu) { usize = rd64(q); q += 8; }
        if (csize == 0xFFFFFFFFu) { csize = rd64(q); q += 8; }
        if (lho == 0xFFFFFFFFu) { lho = rd64(q); q += 8; }
      }
      x += 4 + sz;
    }
    p += 46 + nlen + xlen + clen;
    // local header -> data offset
    if (lho + 30 > buf.size() || rd32(buf.data() + lho) != 0x04034b50)
      return false;
    uint16_t lnlen = rd16(buf.data() + lho + 26);
    uint16_t lxlen = rd16(buf.data() + lho + 28);
    size_t doff = lho + 30 + lnlen + lxlen;
    if (doff + csize > buf.size()) return false;

    std::vector<uint8_t> raw;
    const uint8_t* npy = nullptr;
    size_t npy_len = 0;
    if (method == 0) {
      npy = buf.data() + doff;
      npy_len = csize;
    } else if (method == 8) {
      raw.resize(usize);
      if (!inflate_raw(buf.data() + doff, csize, raw.data(), usize))
        return false;
      npy = raw.data();
      npy_len = usize;
    } else {
      continue;
    }
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
      name = name.substr(0, name.size() - 4);
    Array arr;
    if (parse_npy(npy, npy_len, &arr)) {
      out->names.push_back(name);
      out->arrays.emplace(name, std::move(arr));
    }
  }
  return true;
}

Npz* load_npz(const char* path) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return nullptr;
  auto* npz = new Npz();
  if (!parse_npz(buf, npz)) {
    delete npz;
    return nullptr;
  }
  return npz;
}

// ------------------------- prefetch pool ---------------------------------

struct Pool {
  std::vector<std::string> paths;
  std::atomic<size_t> next_job{0};
  std::map<size_t, Npz*> ready;
  size_t next_serve = 0;
  size_t depth = 4;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    while (!stop.load()) {
      size_t j = next_job.fetch_add(1);
      if (j >= paths.size()) return;
      Npz* npz = load_npz(paths[j].c_str());  // may be nullptr
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop.load() || ready.size() < depth || j < next_serve + depth;
      });
      if (stop.load()) {
        delete npz;
        return;
      }
      ready[j] = npz;
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* ifh_npz_open(const char* path) { return load_npz(path); }

int ifh_npz_num_arrays(void* h) {
  return h ? (int)static_cast<Npz*>(h)->names.size() : 0;
}

const char* ifh_npz_name(void* h, int i) {
  auto* npz = static_cast<Npz*>(h);
  if (!npz || i < 0 || i >= (int)npz->names.size()) return nullptr;
  return npz->names[i].c_str();
}

int ifh_npz_info(void* h, const char* name, int* dtype, int* ndim,
                 int64_t* shape) {
  auto* npz = static_cast<Npz*>(h);
  if (!npz) return -1;
  auto it = npz->arrays.find(name);
  if (it == npz->arrays.end()) return -1;
  *dtype = it->second.dtype;
  *ndim = (int)it->second.shape.size();
  for (size_t i = 0; i < it->second.shape.size() && i < 8; ++i)
    shape[i] = it->second.shape[i];
  return 0;
}

int64_t ifh_npz_read(void* h, const char* name, void* dst,
                     int64_t cap_bytes) {
  auto* npz = static_cast<Npz*>(h);
  if (!npz) return -1;
  auto it = npz->arrays.find(name);
  if (it == npz->arrays.end()) return -1;
  int64_t n = (int64_t)it->second.data.size();
  if (n > cap_bytes) return -1;
  memcpy(dst, it->second.data.data(), n);
  return n;
}

void ifh_npz_close(void* h) { delete static_cast<Npz*>(h); }

// crop to +-range_x/y then pad into a fixed (cap,3) bucket with validity.
// Returns the number of kept points (<= cap; extra points dropped).
int64_t ifh_crop_pad(const float* pts, int64_t n, float range_x,
                     float range_y, float* out_pts, uint8_t* out_valid,
                     int64_t cap) {
  int64_t k = 0;
  for (int64_t i = 0; i < n && k < cap; ++i) {
    float x = pts[3 * i], y = pts[3 * i + 1];
    if (x < -range_x || x > range_x || y < -range_y || y > range_y) continue;
    out_pts[3 * k] = x;
    out_pts[3 * k + 1] = y;
    out_pts[3 * k + 2] = pts[3 * i + 2];
    out_valid[k] = 1;
    ++k;
  }
  for (int64_t i = k; i < cap; ++i) {
    out_pts[3 * i] = out_pts[3 * i + 1] = out_pts[3 * i + 2] = 0.f;
    out_valid[i] = 0;
  }
  return k;
}

void* ifh_prefetch_create(const char** paths, int n_paths, int n_workers,
                          int depth) {
  auto* p = new Pool();
  for (int i = 0; i < n_paths; ++i) p->paths.emplace_back(paths[i]);
  p->depth = depth > 0 ? depth : 4;
  int nw = n_workers > 0 ? n_workers : 2;
  for (int i = 0; i < nw; ++i)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

// blocks until the next (in-order) sample is decoded; returns npz handle
// (caller owns, must ifh_npz_close) or nullptr at end-of-dataset.
void* ifh_prefetch_next(void* pool) {
  auto* p = static_cast<Pool*>(pool);
  if (p->next_serve >= p->paths.size()) return nullptr;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_ready.wait(lk, [&] {
    return p->ready.count(p->next_serve) > 0;
  });
  Npz* npz = p->ready[p->next_serve];
  p->ready.erase(p->next_serve);
  p->next_serve++;
  p->cv_space.notify_all();
  return npz;
}

void ifh_prefetch_destroy(void* pool) {
  auto* p = static_cast<Pool*>(pool);
  p->stop.store(true);
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  for (auto& t : p->workers) t.join();
  for (auto& kv : p->ready) delete kv.second;
  delete p;
}

}  // extern "C"

// ------------------------- HDBSCAN sequential half ------------------------
//
// Device code (ops/cluster.py: mutual_reachability_edges) emits a kNN
// mutual-reachability graph; this routine runs the inherently sequential
// part: Kruskal MST/dendrogram -> condensed tree (min_cluster_size) ->
// excess-of-mass stability selection -> point labels. Forest roots (the kNN
// graph need not be connected) are treated as eligible clusters so isolated
// components remain selectable.

namespace {

struct DsuNode {
  int32_t parent;
};

struct Dendro {
  // merge nodes n..2n-2: children + merge distance + size
  std::vector<int32_t> left, right;
  std::vector<float> dist;
  std::vector<int64_t> size;
};

int32_t dsu_find(std::vector<int32_t>& p, int32_t x) {
  while (p[x] != x) {
    p[x] = p[p[x]];
    x = p[x];
  }
  return x;
}

}  // namespace

// Weighted form: each graph node i stands for node_w[i] original points
// (voxel-dedup representatives, ops/hdbscan.py). Cluster sizes, the
// min_cluster_size gate, and stability mass all count POINTS (sum of
// weights), so the condensed tree behaves as if the duplicates were present
// — the semantics of running upstream hdbscan on the raw cloud. node_w may
// be null (all weights 1: the unweighted behaviour, byte-identical).
static int64_t hdbscan_labels_impl(
    const int32_t* edge_dst, const float* edge_w, const int32_t* node_w,
    int64_t n_points, int32_t edges_per_point, int32_t min_cluster_size,
    int32_t* out_labels) {
  const int64_t n = n_points;
  auto leaf_w = [&](int32_t v) -> int64_t {
    return node_w ? (int64_t)node_w[v] : 1;
  };
  // ---- collect + sort candidate edges --------------------------------
  struct E {
    float w;
    int32_t a, b;
  };
  std::vector<E> edges;
  edges.reserve(n * edges_per_point);
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t e = 0; e < edges_per_point; ++e) {
      int32_t j = edge_dst[i * edges_per_point + e];
      float w = edge_w[i * edges_per_point + e];
      if (j < 0 || j >= n || w >= 1e8f) continue;
      edges.push_back({w, (int32_t)i, j});
    }
  }
  std::sort(edges.begin(), edges.end(),
            [](const E& x, const E& y) { return x.w < y.w; });

  // ---- Kruskal -> dendrogram -----------------------------------------
  std::vector<int32_t> parent(n);
  std::vector<int32_t> comp_node(n);  // dsu root -> dendrogram node id
  for (int64_t i = 0; i < n; ++i) {
    parent[i] = (int32_t)i;
    comp_node[i] = (int32_t)i;
  }
  Dendro d;
  auto node_size = [&](int32_t v) -> int64_t {
    return v < n ? leaf_w(v) : d.size[v - n];
  };
  int32_t next_node = (int32_t)n;
  for (const E& e : edges) {
    int32_t ra = dsu_find(parent, e.a);
    int32_t rb = dsu_find(parent, e.b);
    if (ra == rb) continue;
    int32_t na = comp_node[ra], nb = comp_node[rb];
    d.left.push_back(na);
    d.right.push_back(nb);
    d.dist.push_back(e.w);
    d.size.push_back(node_size(na) + node_size(nb));
    parent[ra] = rb;
    comp_node[rb] = next_node++;
  }

  // ---- roots of the dendrogram forest --------------------------------
  std::vector<char> is_child(next_node, 0);
  for (size_t i = 0; i < d.left.size(); ++i) {
    is_child[d.left[i]] = 1;
    is_child[d.right[i]] = 1;
  }

  // ---- condensed tree -------------------------------------------------
  // walk each merge node top-down carrying its condensed cluster id.
  const int32_t NOISE = -1;
  std::vector<int32_t> cond_parent;       // per condensed cluster
  std::vector<float> cond_birth;          // birth lambda
  std::vector<double> cond_stab;          // accumulated stability
  std::vector<int64_t> cond_size;
  std::vector<int32_t> point_cluster(n, NOISE);  // leaf-most membership
  std::vector<float> point_lambda(n, 0.f);

  struct Item {
    int32_t node;      // dendrogram node
    int32_t cluster;   // condensed cluster id it currently belongs to
  };
  std::vector<Item> stack;

  auto new_cluster = [&](int32_t par, float birth) {
    cond_parent.push_back(par);
    cond_birth.push_back(birth);
    cond_stab.push_back(0.0);
    cond_size.push_back(0);
    return (int32_t)(cond_parent.size() - 1);
  };
  auto assign_subtree = [&](int32_t node, int32_t cluster, float lam) {
    // all leaves under `node` fall out of `cluster` at lambda `lam`
    std::vector<int32_t> st{node};
    while (!st.empty()) {
      int32_t v = st.back();
      st.pop_back();
      if (v < n) {
        point_cluster[v] = cluster;
        point_lambda[v] = lam;
        if (cluster >= 0) {
          int64_t w = leaf_w(v);
          cond_stab[cluster] += (double)w * (lam - cond_birth[cluster]);
          cond_size[cluster] += w;
        }
      } else {
        st.push_back(d.left[v - n]);
        st.push_back(d.right[v - n]);
      }
    }
  };

  for (int32_t v = (int32_t)n; v < next_node; ++v) {
    if (!is_child[v]) {  // forest root: eligible root cluster (birth ~0)
      int32_t c = new_cluster(-1, 0.f);
      stack.push_back({v, c});
    }
  }
  // lone points that never merged stay NOISE
  while (!stack.empty()) {
    Item it = stack.back();
    stack.pop_back();
    int32_t m = it.node - (int32_t)n;
    float lam = d.dist[m] > 0 ? 1.0f / d.dist[m] : 1e9f;
    int32_t l = d.left[m], r = d.right[m];
    int64_t sl = node_size(l), sr = node_size(r);
    bool bl = sl >= min_cluster_size, br = sr >= min_cluster_size;
    if (bl && br) {
      // true split: current cluster dies here; two children born
      if (it.cluster >= 0)
        cond_stab[it.cluster] +=
            (double)(sl + sr) * (lam - cond_birth[it.cluster]);
      int32_t cl = new_cluster(it.cluster, lam);
      int32_t cr = new_cluster(it.cluster, lam);
      // a LEAF can clear min_cluster_size on its own when weighted (a dense
      // voxel's representative); count its mass so EOM can select it
      if (l >= n) stack.push_back({l, cl});
      else { point_cluster[l] = cl; point_lambda[l] = 1e9f;
             cond_size[cl] += leaf_w(l); }
      if (r >= n) stack.push_back({r, cr});
      else { point_cluster[r] = cr; point_lambda[r] = 1e9f;
             cond_size[cr] += leaf_w(r); }
    } else {
      // smaller side falls out; larger side continues in the same cluster
      if (!bl) assign_subtree(l, it.cluster, lam);
      else if (l >= n) stack.push_back({l, it.cluster});
      else assign_subtree(l, it.cluster, lam);
      if (!br) assign_subtree(r, it.cluster, lam);
      else if (r >= n) stack.push_back({r, it.cluster});
      else assign_subtree(r, it.cluster, lam);
    }
  }
  // leaves assigned with lambda=1e9 (still in cluster at death) contribute
  // via the split bookkeeping above; leaf clusters accumulate per-point
  // stability through assign_subtree.

  // ---- excess-of-mass selection (bottom-up) ---------------------------
  int32_t nc = (int32_t)cond_parent.size();
  std::vector<double> subtree(nc, 0.0);
  std::vector<char> selected(nc, 0);
  std::vector<std::vector<int32_t>> children(nc);
  for (int32_t c = 0; c < nc; ++c)
    if (cond_parent[c] >= 0) children[cond_parent[c]].push_back(c);
  // iterate children-before-parents (ids grow downward from roots, so
  // reverse id order is a valid bottom-up order).
  //
  // Forest roots ARE selectable: the MST comes from a kNN graph, so each
  // spatially-isolated object is its own dendrogram root — in the complete
  // mutual-reachability graph it would merge with the rest at a huge
  // distance (lambda ~ 0), which is exactly the birth lambda these roots
  // carry. Excluding roots (upstream's allow_single_cluster=False, harmless
  // on a CONNECTED dendrogram whose root holds almost nothing) would force
  // selection down to short-lived dense-core children and shed every
  // cluster fringe as noise. Childless clusters gate on member count
  // instead: undersized isolated components must stay noise.
  for (int32_t c = nc - 1; c >= 0; --c) {
    double child_sum = 0;
    for (int32_t ch : children[c]) child_sum += subtree[ch];
    if (children[c].empty()) {
      subtree[c] = cond_stab[c];
      selected[c] = cond_size[c] >= min_cluster_size;
    } else if (cond_stab[c] > child_sum) {
      subtree[c] = cond_stab[c];
      selected[c] = 1;
      // deselect descendants
      std::vector<int32_t> st(children[c]);
      while (!st.empty()) {
        int32_t x = st.back();
        st.pop_back();
        selected[x] = 0;
        for (int32_t ch : children[x]) st.push_back(ch);
      }
    } else {
      subtree[c] = child_sum;
    }
  }

  // ---- labels ----------------------------------------------------------
  std::vector<int32_t> sel_id(nc, -1);
  int32_t n_sel = 0;
  for (int32_t c = 0; c < nc; ++c)
    if (selected[c]) sel_id[c] = n_sel++;
  for (int64_t p = 0; p < n; ++p) {
    int32_t c = point_cluster[p];
    int32_t lab = -1;
    while (c >= 0) {
      if (selected[c]) {
        lab = sel_id[c];
        break;
      }
      c = cond_parent[c];
    }
    out_labels[p] = lab;
  }
  return n_sel;
}

extern "C" int64_t ifh_hdbscan_labels(
    const int32_t* edge_dst, const float* edge_w, int64_t n_points,
    int32_t edges_per_point, int32_t min_cluster_size,
    int32_t* out_labels) {
  return hdbscan_labels_impl(edge_dst, edge_w, nullptr, n_points,
                             edges_per_point, min_cluster_size, out_labels);
}

extern "C" int64_t ifh_hdbscan_labels_weighted(
    const int32_t* edge_dst, const float* edge_w, const int32_t* node_w,
    int64_t n_points, int32_t edges_per_point, int32_t min_cluster_size,
    int32_t* out_labels) {
  return hdbscan_labels_impl(edge_dst, edge_w, node_w, n_points,
                             edges_per_point, min_cluster_size, out_labels);
}
