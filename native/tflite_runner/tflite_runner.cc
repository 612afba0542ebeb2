// tflite_runner: a from-scratch, dependency-free C++ interpreter for the
// TFLite models used by the face-landmark front-end (BlazeFace detector,
// attention-mesh landmarker, blendshapes head).
//
// This is the framework's native equivalent of the MediaPipe C++ graph the
// reference depends on (SURVEY §2.1): the Python pipeline in
// aniportrait_tpu/landmark/ drives these kernels through a thin C API
// (ctypes).  It parses the flatbuffer model format directly and implements
// the ~19 builtin ops these models need, fp32 NHWC, with fp16 weight
// dequantization constant-folded at load.
//
// Schema constants verified against tensorflow.lite schema (see
// aniportrait_tpu/landmark/native.py for the binding + validation tests).

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal flatbuffer reading
// ---------------------------------------------------------------------------
struct FB {
  const uint8_t* base;

  template <typename T>
  T Read(size_t pos) const {
    T v;
    std::memcpy(&v, base + pos, sizeof(T));
    return v;
  }

  // Returns absolute position of field data in table at `table`, or 0.
  size_t Field(size_t table, int field_id) const {
    int32_t soffset = Read<int32_t>(table);
    size_t vtable = table - soffset;
    uint16_t vsize = Read<uint16_t>(vtable);
    size_t slot = 4 + 2 * field_id;
    if (slot >= vsize) return 0;
    uint16_t off = Read<uint16_t>(vtable + slot);
    if (off == 0) return 0;
    return table + off;
  }

  template <typename T>
  T Scalar(size_t table, int field_id, T def) const {
    size_t p = Field(table, field_id);
    return p ? Read<T>(p) : def;
  }

  // Follow an offset field to a table/vector/string position.
  size_t Indirect(size_t table, int field_id) const {
    size_t p = Field(table, field_id);
    if (!p) return 0;
    return p + Read<uint32_t>(p);
  }

  uint32_t VecLen(size_t vec) const { return vec ? Read<uint32_t>(vec) : 0; }

  // Element of a vector of offsets (tables/strings).
  size_t VecTable(size_t vec, uint32_t i) const {
    size_t p = vec + 4 + 4 * i;
    return p + Read<uint32_t>(p);
  }

  // Raw data pointer of a vector of scalars.
  const uint8_t* VecData(size_t vec) const { return base + vec + 4; }

  size_t Root() const { return Read<uint32_t>(0); }
};

inline float HalfToFloat(uint16_t h) {
  uint32_t sign = (h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(mant & 0x400)) {
        mant <<= 1;
        exp--;
      }
      mant &= 0x3FF;
      bits = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

// ---------------------------------------------------------------------------
// Model representation
// ---------------------------------------------------------------------------
enum Op {
  kAdd = 0,
  kConcat = 2,
  kConv2D = 3,
  kDwConv2D = 4,
  kDequantize = 6,
  kLogistic = 14,
  kMaxPool = 17,
  kMul = 18,
  kRelu = 19,
  kReshape = 22,
  kPad = 34,
  kTranspose = 39,
  kMean = 40,
  kSub = 41,
  kDiv = 42,
  kStridedSlice = 45,
  kPrelu = 54,
  kNeg = 59,
  kSum = 74,
  kSqrt = 75,
  kRsqrt = 76,
  kSquaredDifference = 99,
};

struct Tensor {
  std::vector<int> shape;
  int type = 0;  // 0 f32, 1 f16, 2 i32
  std::vector<float> data;     // f32 storage (constants + activations)
  std::vector<int32_t> idata;  // i32 constants (pads, perms, axes)
  bool is_const = false;

  size_t NumElements() const {
    size_t n = 1;
    for (int d : shape) n *= (size_t)d;
    return n;
  }
};

struct Node {
  int op;
  std::vector<int> inputs;
  std::vector<int> outputs;
  // conv / pool options
  int padding = 0;  // 0 SAME, 1 VALID
  int stride_w = 1, stride_h = 1;
  int filter_w = 0, filter_h = 0;
  int dilation_w = 1, dilation_h = 1;
  int depth_multiplier = 1;
  int activation = 0;  // 0 none, 1 relu, 3 relu6
  int axis = 0;
  bool keep_dims = false;
  int begin_mask = 0, end_mask = 0, shrink_axis_mask = 0;
};

struct Model {
  std::vector<Tensor> tensors;
  std::vector<Node> nodes;
  std::vector<int> inputs, outputs;
};

// Builtin options field ids (tflite schema.fbs)
// Conv2DOptions: padding=0 stride_w=1 stride_h=2 act=3 dil_w=4 dil_h=5
// DepthwiseConv2DOptions: padding=0 sw=1 sh=2 depth_mult=3 act=4 dw=5 dh=6
// Pool2DOptions: padding=0 sw=1 sh=2 fw=3 fh=4 act=5
// ConcatenationOptions: axis=0 act=1
// AddOptions/Sub/Mul/Div: act=0
// ReducerOptions: keep_dims=0
// StridedSliceOptions: begin_mask=0 end_mask=1 ellipsis=2 new_axis=3 shrink=4

Model* LoadModel(const uint8_t* buf, size_t len) {
  (void)len;
  FB fb{buf};
  auto m = std::make_unique<Model>();
  size_t root = fb.Root();

  // operator codes
  size_t opcodes_vec = fb.Indirect(root, 1);
  std::vector<int> op_of_code;
  for (uint32_t i = 0; i < fb.VecLen(opcodes_vec); i++) {
    size_t oc = fb.VecTable(opcodes_vec, i);
    int dep = fb.Scalar<int8_t>(oc, 0, 0);
    int full = fb.Scalar<int32_t>(oc, 3, 0);
    op_of_code.push_back(std::max(dep, full));
  }

  size_t buffers_vec = fb.Indirect(root, 4);
  size_t subgraphs = fb.Indirect(root, 2);
  size_t sg = fb.VecTable(subgraphs, 0);

  // tensors
  size_t tensors_vec = fb.Indirect(sg, 0);
  uint32_t n_tensors = fb.VecLen(tensors_vec);
  m->tensors.resize(n_tensors);
  for (uint32_t i = 0; i < n_tensors; i++) {
    size_t t = fb.VecTable(tensors_vec, i);
    Tensor& out = m->tensors[i];
    size_t shape_vec = fb.Indirect(t, 0);
    for (uint32_t d = 0; d < fb.VecLen(shape_vec); d++) {
      out.shape.push_back(
          ((const int32_t*)fb.VecData(shape_vec))[d]);
    }
    out.type = fb.Scalar<int8_t>(t, 1, 0);
    uint32_t buf_idx = fb.Scalar<uint32_t>(t, 2, 0);
    if (buf_idx > 0) {
      size_t b = fb.VecTable(buffers_vec, buf_idx);
      size_t data_vec = fb.Indirect(b, 0);
      uint32_t nbytes = fb.VecLen(data_vec);
      if (nbytes > 0) {
        out.is_const = true;
        const uint8_t* p = fb.VecData(data_vec);
        size_t n = out.NumElements();
        if (out.type == 0) {  // f32
          out.data.resize(n);
          std::memcpy(out.data.data(), p, n * 4);
        } else if (out.type == 1) {  // f16 -> dequantized lazily by op
          out.data.resize(n);
          const uint16_t* hp = (const uint16_t*)p;
          for (size_t k = 0; k < n; k++) out.data[k] = HalfToFloat(hp[k]);
        } else if (out.type == 2) {  // i32
          out.idata.resize(n);
          std::memcpy(out.idata.data(), p, n * 4);
        } else if (out.type == 4) {  // i64 -> narrow
          out.idata.resize(n);
          const int64_t* lp = (const int64_t*)p;
          for (size_t k = 0; k < n; k++) out.idata[k] = (int32_t)lp[k];
        }
      }
    }
  }

  // graph io
  size_t in_vec = fb.Indirect(sg, 1);
  for (uint32_t i = 0; i < fb.VecLen(in_vec); i++)
    m->inputs.push_back(((const int32_t*)fb.VecData(in_vec))[i]);
  size_t out_vec = fb.Indirect(sg, 2);
  for (uint32_t i = 0; i < fb.VecLen(out_vec); i++)
    m->outputs.push_back(((const int32_t*)fb.VecData(out_vec))[i]);

  // operators
  size_t ops_vec = fb.Indirect(sg, 3);
  for (uint32_t i = 0; i < fb.VecLen(ops_vec); i++) {
    size_t op_t = fb.VecTable(ops_vec, i);
    Node node;
    node.op = op_of_code[fb.Scalar<uint32_t>(op_t, 0, 0)];
    size_t iv = fb.Indirect(op_t, 1);
    for (uint32_t k = 0; k < fb.VecLen(iv); k++)
      node.inputs.push_back(((const int32_t*)fb.VecData(iv))[k]);
    size_t ov = fb.Indirect(op_t, 2);
    for (uint32_t k = 0; k < fb.VecLen(ov); k++)
      node.outputs.push_back(((const int32_t*)fb.VecData(ov))[k]);

    size_t opt = fb.Indirect(op_t, 4);
    if (opt) {
      switch (node.op) {
        case kConv2D:
          node.padding = fb.Scalar<int8_t>(opt, 0, 0);
          node.stride_w = fb.Scalar<int32_t>(opt, 1, 1);
          node.stride_h = fb.Scalar<int32_t>(opt, 2, 1);
          node.activation = fb.Scalar<int8_t>(opt, 3, 0);
          node.dilation_w = fb.Scalar<int32_t>(opt, 4, 1);
          node.dilation_h = fb.Scalar<int32_t>(opt, 5, 1);
          break;
        case kDwConv2D:
          node.padding = fb.Scalar<int8_t>(opt, 0, 0);
          node.stride_w = fb.Scalar<int32_t>(opt, 1, 1);
          node.stride_h = fb.Scalar<int32_t>(opt, 2, 1);
          node.depth_multiplier = fb.Scalar<int32_t>(opt, 3, 1);
          node.activation = fb.Scalar<int8_t>(opt, 4, 0);
          node.dilation_w = fb.Scalar<int32_t>(opt, 5, 1);
          node.dilation_h = fb.Scalar<int32_t>(opt, 6, 1);
          break;
        case kMaxPool:
          node.padding = fb.Scalar<int8_t>(opt, 0, 0);
          node.stride_w = fb.Scalar<int32_t>(opt, 1, 1);
          node.stride_h = fb.Scalar<int32_t>(opt, 2, 1);
          node.filter_w = fb.Scalar<int32_t>(opt, 3, 0);
          node.filter_h = fb.Scalar<int32_t>(opt, 4, 0);
          node.activation = fb.Scalar<int8_t>(opt, 5, 0);
          break;
        case kConcat:
          node.axis = fb.Scalar<int32_t>(opt, 0, 0);
          node.activation = fb.Scalar<int8_t>(opt, 1, 0);
          break;
        case kAdd:
        case kSub:
        case kMul:
        case kDiv:
          node.activation = fb.Scalar<int8_t>(opt, 0, 0);
          break;
        case kMean:
        case kSum:
          node.keep_dims = fb.Scalar<uint8_t>(opt, 0, 0) != 0;
          break;
        case kStridedSlice:
          node.begin_mask = fb.Scalar<int32_t>(opt, 0, 0);
          node.end_mask = fb.Scalar<int32_t>(opt, 1, 0);
          node.shrink_axis_mask = fb.Scalar<int32_t>(opt, 4, 0);
          break;
        default:
          break;
      }
    }
    m->nodes.push_back(std::move(node));
  }
  return m.release();
}

// ---------------------------------------------------------------------------
// Kernels (fp32, NHWC)
// ---------------------------------------------------------------------------
inline float Act(float v, int a) {
  if (a == 1) return v > 0 ? v : 0;          // RELU
  if (a == 3) return std::min(std::max(v, 0.f), 6.f);  // RELU6
  return v;
}

void Conv2D(const Node& n, const Tensor& in, const Tensor& w, const Tensor& b,
            Tensor& out) {
  int H = in.shape[1], W = in.shape[2], C = in.shape[3];
  int OC = w.shape[0], KH = w.shape[1], KW = w.shape[2];
  int OH = out.shape[1], OW = out.shape[2];
  int pad_h = 0, pad_w = 0;
  if (n.padding == 0) {  // SAME
    pad_h = std::max(0, ((OH - 1) * n.stride_h + (KH - 1) * n.dilation_h + 1 - H) / 2);
    pad_w = std::max(0, ((OW - 1) * n.stride_w + (KW - 1) * n.dilation_w + 1 - W) / 2);
  }
  const float* bias = b.data.empty() ? nullptr : b.data.data();
  for (int oy = 0; oy < OH; oy++) {
    for (int ox = 0; ox < OW; ox++) {
      float* op = &out.data[((size_t)oy * OW + ox) * OC];
      for (int oc = 0; oc < OC; oc++) op[oc] = bias ? bias[oc] : 0.f;
      for (int ky = 0; ky < KH; ky++) {
        int iy = oy * n.stride_h + ky * n.dilation_h - pad_h;
        if (iy < 0 || iy >= H) continue;
        for (int kx = 0; kx < KW; kx++) {
          int ix = ox * n.stride_w + kx * n.dilation_w - pad_w;
          if (ix < 0 || ix >= W) continue;
          const float* ip = &in.data[((size_t)iy * W + ix) * C];
          const float* wp = &w.data[(((size_t)0 * KH + ky) * KW + kx) * C];
          // weight layout OIHW? tflite conv weights: (OC, KH, KW, C)
          for (int oc = 0; oc < OC; oc++) {
            const float* wpc = &w.data[((((size_t)oc * KH + ky) * KW) + kx) * C];
            float acc = 0.f;
            for (int c = 0; c < C; c++) acc += ip[c] * wpc[c];
            op[oc] += acc;
          }
          (void)wp;
        }
      }
      for (int oc = 0; oc < OC; oc++) op[oc] = Act(op[oc], n.activation);
    }
  }
}

void DwConv2D(const Node& n, const Tensor& in, const Tensor& w, const Tensor& b,
              Tensor& out) {
  int H = in.shape[1], W = in.shape[2], C = in.shape[3];
  int KH = w.shape[1], KW = w.shape[2], OC = w.shape[3];
  int OH = out.shape[1], OW = out.shape[2];
  int mult = n.depth_multiplier;
  int pad_h = 0, pad_w = 0;
  if (n.padding == 0) {
    pad_h = std::max(0, ((OH - 1) * n.stride_h + KH - H) / 2);
    pad_w = std::max(0, ((OW - 1) * n.stride_w + KW - W) / 2);
  }
  const float* bias = b.data.empty() ? nullptr : b.data.data();
  for (int oy = 0; oy < OH; oy++) {
    for (int ox = 0; ox < OW; ox++) {
      float* op = &out.data[((size_t)oy * OW + ox) * OC];
      for (int oc = 0; oc < OC; oc++) op[oc] = bias ? bias[oc] : 0.f;
      for (int ky = 0; ky < KH; ky++) {
        int iy = oy * n.stride_h + ky - pad_h;
        if (iy < 0 || iy >= H) continue;
        for (int kx = 0; kx < KW; kx++) {
          int ix = ox * n.stride_w + kx - pad_w;
          if (ix < 0 || ix >= W) continue;
          const float* ip = &in.data[((size_t)iy * W + ix) * C];
          const float* wp = &w.data[(((size_t)ky * KW) + kx) * OC];
          for (int c = 0; c < C; c++)
            for (int mres = 0; mres < mult; mres++)
              op[c * mult + mres] += ip[c] * wp[c * mult + mres];
        }
      }
      for (int oc = 0; oc < OC; oc++) op[oc] = Act(op[oc], n.activation);
    }
  }
}

void MaxPool(const Node& n, const Tensor& in, Tensor& out) {
  int H = in.shape[1], W = in.shape[2], C = in.shape[3];
  int OH = out.shape[1], OW = out.shape[2];
  int pad_h = 0, pad_w = 0;
  if (n.padding == 0) {
    pad_h = std::max(0, ((OH - 1) * n.stride_h + n.filter_h - H) / 2);
    pad_w = std::max(0, ((OW - 1) * n.stride_w + n.filter_w - W) / 2);
  }
  for (int oy = 0; oy < OH; oy++)
    for (int ox = 0; ox < OW; ox++) {
      float* op = &out.data[((size_t)oy * OW + ox) * C];
      for (int c = 0; c < C; c++) op[c] = -1e30f;
      for (int ky = 0; ky < n.filter_h; ky++) {
        int iy = oy * n.stride_h + ky - pad_h;
        if (iy < 0 || iy >= H) continue;
        for (int kx = 0; kx < n.filter_w; kx++) {
          int ix = ox * n.stride_w + kx - pad_w;
          if (ix < 0 || ix >= W) continue;
          const float* ip = &in.data[((size_t)iy * W + ix) * C];
          for (int c = 0; c < C; c++) op[c] = std::max(op[c], ip[c]);
        }
      }
      for (int c = 0; c < C; c++) op[c] = Act(op[c], n.activation);
    }
}

// generic broadcast binary over equal-rank (or scalar) shapes
void Binary(int op, int act, const Tensor& a, const Tensor& b, Tensor& out) {
  size_t n = out.NumElements();
  int rank = (int)out.shape.size();
  std::vector<int> sa(rank, 1), sb(rank, 1), so(out.shape.begin(), out.shape.end());
  for (int i = 0; i < (int)a.shape.size(); i++)
    sa[rank - a.shape.size() + i] = a.shape[i];
  for (int i = 0; i < (int)b.shape.size(); i++)
    sb[rank - b.shape.size() + i] = b.shape[i];
  std::vector<size_t> stra(rank), strb(rank), stro(rank);
  size_t pa = 1, pb = 1, po = 1;
  for (int i = rank - 1; i >= 0; i--) {
    stra[i] = (sa[i] == 1) ? 0 : pa;
    strb[i] = (sb[i] == 1) ? 0 : pb;
    stro[i] = po;
    pa *= sa[i];
    pb *= sb[i];
    po *= so[i];
  }
  std::vector<int> idx(rank, 0);
  for (size_t lin = 0; lin < n; lin++) {
    size_t ia = 0, ib = 0;
    size_t rem = lin;
    for (int i = 0; i < rank; i++) {
      int id = (int)(rem / stro[i]);
      rem %= stro[i];
      ia += id * stra[i];
      ib += id * strb[i];
    }
    float x = a.data[ia], y = b.data[ib], v = 0;
    switch (op) {
      case kAdd: v = x + y; break;
      case kSub: v = x - y; break;
      case kMul: v = x * y; break;
      case kDiv: v = x / y; break;
      case kSquaredDifference: v = (x - y) * (x - y); break;
    }
    out.data[lin] = Act(v, act);
  }
}

void Pad(const Tensor& in, const Tensor& pads, Tensor& out) {
  int rank = (int)in.shape.size();
  std::fill(out.data.begin(), out.data.end(), 0.f);
  std::vector<size_t> si(rank), so(rank);
  size_t pi = 1, po = 1;
  for (int i = rank - 1; i >= 0; i--) {
    si[i] = pi;
    so[i] = po;
    pi *= in.shape[i];
    po *= out.shape[i];
  }
  size_t n = in.NumElements();
  for (size_t lin = 0; lin < n; lin++) {
    size_t rem = lin, oidx = 0;
    for (int i = 0; i < rank; i++) {
      int id = (int)(rem / si[i]);
      rem %= si[i];
      oidx += (id + pads.idata[2 * i]) * so[i];
    }
    out.data[oidx] = in.data[lin];
  }
}

void Transpose(const Tensor& in, const Tensor& perm, Tensor& out) {
  int rank = (int)in.shape.size();
  std::vector<size_t> si(rank), so(rank);
  size_t pi = 1, po = 1;
  for (int i = rank - 1; i >= 0; i--) {
    si[i] = pi;
    pi *= in.shape[i];
    so[i] = po;
    po *= out.shape[i];
  }
  size_t n = in.NumElements();
  for (size_t lin = 0; lin < n; lin++) {
    size_t rem = lin, oidx = 0;
    std::vector<int> id(rank);
    for (int i = 0; i < rank; i++) {
      id[i] = (int)(rem / si[i]);
      rem %= si[i];
    }
    for (int i = 0; i < rank; i++) oidx += id[perm.idata[i]] * so[i];
    out.data[oidx] = in.data[lin];
  }
}

void Reduce(int op, const Tensor& in, const Tensor& axes, Tensor& out) {
  int rank = (int)in.shape.size();
  std::vector<bool> reduced(rank, false);
  for (int a : axes.idata) reduced[(a + rank) % rank] = true;
  std::fill(out.data.begin(), out.data.end(), 0.f);
  std::vector<size_t> si(rank);
  size_t pi = 1;
  for (int i = rank - 1; i >= 0; i--) {
    si[i] = pi;
    pi *= in.shape[i];
  }
  // output strides over non-reduced dims
  std::vector<size_t> so(rank, 0);
  size_t po = 1;
  for (int i = rank - 1; i >= 0; i--) {
    if (!reduced[i]) {
      so[i] = po;
      po *= in.shape[i];
    }
  }
  size_t count = 1;
  for (int i = 0; i < rank; i++)
    if (reduced[i]) count *= in.shape[i];
  size_t n = in.NumElements();
  for (size_t lin = 0; lin < n; lin++) {
    size_t rem = lin, oidx = 0;
    for (int i = 0; i < rank; i++) {
      int id = (int)(rem / si[i]);
      rem %= si[i];
      oidx += id * so[i];
    }
    out.data[oidx] += in.data[lin];
  }
  if (op == kMean)
    for (auto& v : out.data) v /= (float)count;
}

void StridedSlice(const Node& n, const Tensor& in, const Tensor& begin,
                  const Tensor& end, const Tensor& strides, Tensor& out) {
  int rank = (int)in.shape.size();
  std::vector<int> b(rank), e(rank), s(rank);
  for (int i = 0; i < rank; i++) {
    s[i] = strides.idata[i];
    b[i] = (n.begin_mask >> i) & 1 ? (s[i] > 0 ? 0 : in.shape[i] - 1)
                                   : begin.idata[i];
    e[i] = (n.end_mask >> i) & 1 ? (s[i] > 0 ? in.shape[i] : -1) : end.idata[i];
    if (b[i] < 0) b[i] += in.shape[i];
    if (e[i] < 0 && !((n.end_mask >> i) & 1 && s[i] < 0)) e[i] += in.shape[i];
  }
  std::vector<size_t> si(rank);
  size_t pi = 1;
  for (int i = rank - 1; i >= 0; i--) {
    si[i] = pi;
    pi *= in.shape[i];
  }
  // iterate output positions
  std::vector<int> cnt(rank);
  for (int i = 0; i < rank; i++) {
    cnt[i] = std::max(0, (e[i] - b[i] + s[i] + (s[i] > 0 ? -1 : 1)) / s[i]);
  }
  size_t total = 1;
  for (int c : cnt) total *= (size_t)c;
  std::vector<int> id(rank, 0);
  for (size_t o = 0; o < total; o++) {
    size_t iidx = 0;
    for (int i = 0; i < rank; i++) iidx += (size_t)(b[i] + id[i] * s[i]) * si[i];
    out.data[o] = in.data[iidx];
    for (int i = rank - 1; i >= 0; i--) {
      if (++id[i] < cnt[i]) break;
      id[i] = 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Interpreter
// ---------------------------------------------------------------------------
struct Runner {
  std::unique_ptr<Model> model;

  void Invoke() {
    auto& T = model->tensors;
    for (auto& n : model->nodes) {
      Tensor& out = T[n.outputs[0]];
      if (out.data.size() != out.NumElements() && out.type != 2)
        out.data.resize(out.NumElements());
      switch (n.op) {
        case kDequantize: {
          // fp16 constants were dequantized at load: copy/alias
          out.data = T[n.inputs[0]].data;
          break;
        }
        case kConv2D:
          Conv2D(n, T[n.inputs[0]], T[n.inputs[1]], T[n.inputs[2]], out);
          break;
        case kDwConv2D:
          DwConv2D(n, T[n.inputs[0]], T[n.inputs[1]], T[n.inputs[2]], out);
          break;
        case kMaxPool:
          MaxPool(n, T[n.inputs[0]], out);
          break;
        case kAdd:
        case kSub:
        case kMul:
        case kDiv:
        case kSquaredDifference:
          Binary(n.op, n.activation, T[n.inputs[0]], T[n.inputs[1]], out);
          break;
        case kRelu: {
          const Tensor& in = T[n.inputs[0]];
          for (size_t i = 0; i < out.data.size(); i++)
            out.data[i] = in.data[i] > 0 ? in.data[i] : 0;
          break;
        }
        case kPrelu: {
          const Tensor& in = T[n.inputs[0]];
          const Tensor& alpha = T[n.inputs[1]];
          size_t c = alpha.NumElements();
          for (size_t i = 0; i < out.data.size(); i++) {
            float v = in.data[i];
            out.data[i] = v >= 0 ? v : v * alpha.data[i % c];
          }
          break;
        }
        case kLogistic: {
          const Tensor& in = T[n.inputs[0]];
          for (size_t i = 0; i < out.data.size(); i++)
            out.data[i] = 1.f / (1.f + std::exp(-in.data[i]));
          break;
        }
        case kNeg: {
          const Tensor& in = T[n.inputs[0]];
          for (size_t i = 0; i < out.data.size(); i++) out.data[i] = -in.data[i];
          break;
        }
        case kSqrt: {
          const Tensor& in = T[n.inputs[0]];
          for (size_t i = 0; i < out.data.size(); i++)
            out.data[i] = std::sqrt(in.data[i]);
          break;
        }
        case kRsqrt: {
          const Tensor& in = T[n.inputs[0]];
          for (size_t i = 0; i < out.data.size(); i++)
            out.data[i] = 1.f / std::sqrt(in.data[i]);
          break;
        }
        case kReshape: {
          out.data = T[n.inputs[0]].data;
          break;
        }
        case kConcat: {
          int rank = (int)out.shape.size();
          int axis = (n.axis + rank) % rank;
          size_t outer = 1, inner = 1;
          for (int i = 0; i < axis; i++) outer *= out.shape[i];
          for (int i = axis + 1; i < rank; i++) inner *= out.shape[i];
          size_t off = 0;
          for (int t : n.inputs) {
            const Tensor& in = T[t];
            size_t len = (size_t)in.shape[axis] * inner;
            for (size_t o = 0; o < outer; o++)
              std::memcpy(&out.data[o * (size_t)out.shape[axis] * inner + off],
                          &in.data[o * len], len * 4);
            off += len;
          }
          break;
        }
        case kPad:
          Pad(T[n.inputs[0]], T[n.inputs[1]], out);
          break;
        case kTranspose:
          Transpose(T[n.inputs[0]], T[n.inputs[1]], out);
          break;
        case kMean:
        case kSum:
          Reduce(n.op, T[n.inputs[0]], T[n.inputs[1]], out);
          break;
        case kStridedSlice:
          StridedSlice(n, T[n.inputs[0]], T[n.inputs[1]], T[n.inputs[2]],
                       T[n.inputs[3]], out);
          break;
        default:
          assert(false && "unsupported op");
      }
    }
  }
};

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------
extern "C" {

void* flr_create(const uint8_t* buf, size_t len) {
  auto* r = new Runner();
  r->model.reset(LoadModel(buf, len));
  for (int t : r->model->inputs) {
    Tensor& in = r->model->tensors[t];
    in.data.resize(in.NumElements());
  }
  return r;
}

void flr_destroy(void* h) { delete (Runner*)h; }

int flr_num_inputs(void* h) { return (int)((Runner*)h)->model->inputs.size(); }
int flr_num_outputs(void* h) { return (int)((Runner*)h)->model->outputs.size(); }

int flr_input_size(void* h, int i) {
  Runner* r = (Runner*)h;
  return (int)r->model->tensors[r->model->inputs[i]].NumElements();
}
int flr_output_size(void* h, int i) {
  Runner* r = (Runner*)h;
  return (int)r->model->tensors[r->model->outputs[i]].NumElements();
}

void flr_set_input(void* h, int i, const float* data, int n) {
  Runner* r = (Runner*)h;
  Tensor& t = r->model->tensors[r->model->inputs[i]];
  t.data.assign(data, data + n);
}

void flr_invoke(void* h) { ((Runner*)h)->Invoke(); }

void flr_get_output(void* h, int i, float* data, int n) {
  Runner* r = (Runner*)h;
  Tensor& t = r->model->tensors[r->model->outputs[i]];
  std::memcpy(data, t.data.data(), (size_t)n * 4);
}

}  // extern "C"
