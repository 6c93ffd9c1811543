// Native host runtime for facerecognizeonnx_tpu.
//
// The reference's runtime layer is C++ end to end (ONNX Runtime +
// OpenCV, SURVEY.md §1 L1/L2). In the TPU framework the device path is
// XLA; this library is the native HOST side of the runtime:
//
//   frt_letterbox   — uint8 bilinear letterbox (the reference's
//                     preprocess geometry, src/face_detector.cpp:92-137)
//                     so video pipelines can prepare fixed-size frames
//                     off the critical path without NumPy overhead
//   frt_nms         — greedy NMS with EXACT reference semantics,
//                     including the integer-rect IoU variant
//                     (src/face_detector.cpp:340-384) — used as the
//                     bit-parity oracle for the device NMS and as a
//                     host fallback
//   frt_ring_*      — a pthread ring buffer of frames: a producer
//                     thread decodes+letterboxes while the consumer
//                     feeds the TPU, overlapping host I/O with device
//                     compute (the reference processes frames strictly
//                     serially, src/main.cpp:214-257)
//
// Build: make -C facerecognizeonnx_tpu/runtime/cc   (g++ -O3 -shared)

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- letterbox

// Bilinear resize (half-pixel centers, edge clamp — cv2.INTER_LINEAR
// geometry) of src (sh x sw x 3, BGR uint8) by `scale`, written into the
// top-left of dst (dsize x dsize x 3); the rest of dst is zeroed.
// Returns the scale actually used (min(dsize/w, dsize/h)).
float frt_letterbox(const uint8_t* src, int sh, int sw, uint8_t* dst,
                    int dsize) {
  float scale = std::min((float)dsize / sw, (float)dsize / sh);
  int nw = (int)(sw * scale);
  int nh = (int)(sh * scale);
  std::memset(dst, 0, (size_t)dsize * dsize * 3);
  if (nw <= 0 || nh <= 0) return 1.0f;

  // Precompute x-axis sample positions/weights once per row sweep.
  std::vector<int> x0(nw), x1(nw);
  std::vector<float> wx(nw);
  for (int j = 0; j < nw; ++j) {
    float sx = (j + 0.5f) * (float)sw / nw - 0.5f;
    float fx = std::floor(sx);
    wx[j] = sx - fx;
    int xi = (int)fx;
    x0[j] = std::min(std::max(xi, 0), sw - 1);
    x1[j] = std::min(std::max(xi + 1, 0), sw - 1);
  }
  for (int i = 0; i < nh; ++i) {
    float sy = (i + 0.5f) * (float)sh / nh - 0.5f;
    float fy = std::floor(sy);
    float wy = sy - fy;
    int yi = (int)fy;
    int y0 = std::min(std::max(yi, 0), sh - 1);
    int y1 = std::min(std::max(yi + 1, 0), sh - 1);
    const uint8_t* r0 = src + (size_t)y0 * sw * 3;
    const uint8_t* r1 = src + (size_t)y1 * sw * 3;
    uint8_t* out = dst + (size_t)i * dsize * 3;
    for (int j = 0; j < nw; ++j) {
      const uint8_t* p00 = r0 + x0[j] * 3;
      const uint8_t* p01 = r0 + x1[j] * 3;
      const uint8_t* p10 = r1 + x0[j] * 3;
      const uint8_t* p11 = r1 + x1[j] * 3;
      float w00 = (1 - wy) * (1 - wx[j]), w01 = (1 - wy) * wx[j];
      float w10 = wy * (1 - wx[j]), w11 = wy * wx[j];
      for (int c = 0; c < 3; ++c) {
        float v = w00 * p00[c] + w01 * p01[c] + w10 * p10[c] + w11 * p11[c];
        out[j * 3 + c] = (uint8_t)(v + 0.5f);
      }
    }
  }
  return scale;
}

// ---------------------------------------------------------------------- NMS

// Greedy NMS over (x1,y1,x2,y2) float boxes sorted internally by
// descending score. keep_out[i] = 1 if box i (ORIGINAL index) survives.
// int_rects=1 reproduces the reference's integer-truncated rect IoU
// (cv::Rect of ints, src/face_detector.cpp:260-265,340-354); 0 = float.
// Returns the number of surviving boxes.
int frt_nms(const float* boxes, const float* scores, int n, float iou_thr,
            int int_rects, int32_t* keep_out) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });

  struct R {
    float x1, y1, x2, y2;
  };
  std::vector<R> r(n);
  for (int k = 0; k < n; ++k) {
    const float* b = boxes + (size_t)order[k] * 4;
    if (int_rects) {
      // reference: x=int(x1), y=int(y1), w=int(x2-x1), h=int(y2-y1)
      int x = (int)b[0], y = (int)b[1];
      int w = (int)(b[2] - b[0]), h = (int)(b[3] - b[1]);
      r[k] = {(float)x, (float)y, (float)(x + w), (float)(y + h)};
    } else {
      r[k] = {b[0], b[1], b[2], b[3]};
    }
  }

  std::vector<char> suppressed(n, 0);
  for (int i = 0; i < n; ++i) {
    if (suppressed[i]) continue;
    for (int j = i + 1; j < n; ++j) {
      if (suppressed[j]) continue;
      float ix1 = std::max(r[i].x1, r[j].x1);
      float iy1 = std::max(r[i].y1, r[j].y1);
      float ix2 = std::min(r[i].x2, r[j].x2);
      float iy2 = std::min(r[i].y2, r[j].y2);
      float iw = std::max(0.0f, ix2 - ix1);
      float ih = std::max(0.0f, iy2 - iy1);
      float inter = iw * ih;
      float a1 = (r[i].x2 - r[i].x1) * (r[i].y2 - r[i].y1);
      float a2 = (r[j].x2 - r[j].x1) * (r[j].y2 - r[j].y1);
      float denom = a1 + a2 - inter;
      float iou = denom > 0 ? inter / denom : 0.0f;
      if (iou > iou_thr) suppressed[j] = 1;
    }
  }
  int kept = 0;
  std::memset(keep_out, 0, sizeof(int32_t) * n);
  for (int k = 0; k < n; ++k) {
    if (!suppressed[k]) {
      keep_out[order[k]] = 1;
      ++kept;
    }
  }
  return kept;
}

// -------------------------------------------------------------- frame ring

struct FrtRing {
  std::vector<uint8_t> data;
  std::vector<float> scales;
  size_t frame_bytes;
  int capacity;
  int head = 0, tail = 0, count = 0;
  bool closed = false;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
};

void* frt_ring_create(int capacity, size_t frame_bytes) {
  auto* ring = new FrtRing();
  ring->capacity = capacity;
  ring->frame_bytes = frame_bytes;
  ring->data.resize((size_t)capacity * frame_bytes);
  ring->scales.resize(capacity);
  return ring;
}

void frt_ring_destroy(void* h) { delete (FrtRing*)h; }

void frt_ring_close(void* h) {
  auto* ring = (FrtRing*)h;
  {
    std::lock_guard<std::mutex> lk(ring->mu);
    ring->closed = true;
  }
  ring->cv_push.notify_all();
  ring->cv_pop.notify_all();
}

// Push one frame (blocks up to timeout_ms while full). Returns 0 on
// success, -1 on timeout, -2 if the ring is closed.
int frt_ring_push(void* h, const uint8_t* frame, float scale, int timeout_ms) {
  auto* ring = (FrtRing*)h;
  std::unique_lock<std::mutex> lk(ring->mu);
  bool ok = ring->cv_push.wait_for(
      lk, std::chrono::milliseconds(timeout_ms),
      [&] { return ring->count < ring->capacity || ring->closed; });
  if (ring->closed) return -2;
  if (!ok) return -1;
  std::memcpy(&ring->data[(size_t)ring->head * ring->frame_bytes], frame,
              ring->frame_bytes);
  ring->scales[ring->head] = scale;
  ring->head = (ring->head + 1) % ring->capacity;
  ring->count++;
  lk.unlock();
  ring->cv_pop.notify_one();
  return 0;
}

// Pop one frame (blocks up to timeout_ms while empty). Returns 0 on
// success, -1 on timeout, -2 if closed AND drained.
int frt_ring_pop(void* h, uint8_t* out, float* scale_out, int timeout_ms) {
  auto* ring = (FrtRing*)h;
  std::unique_lock<std::mutex> lk(ring->mu);
  bool ok = ring->cv_pop.wait_for(
      lk, std::chrono::milliseconds(timeout_ms),
      [&] { return ring->count > 0 || ring->closed; });
  if (ring->count == 0) return ring->closed ? -2 : -1;
  if (!ok) return -1;
  std::memcpy(out, &ring->data[(size_t)ring->tail * ring->frame_bytes],
              ring->frame_bytes);
  if (scale_out) *scale_out = ring->scales[ring->tail];
  ring->tail = (ring->tail + 1) % ring->capacity;
  ring->count--;
  lk.unlock();
  ring->cv_push.notify_one();
  return 0;
}

int frt_ring_size(void* h) {
  auto* ring = (FrtRing*)h;
  std::lock_guard<std::mutex> lk(ring->mu);
  return ring->count;
}

}  // extern "C"
