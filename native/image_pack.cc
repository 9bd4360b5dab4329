// Space-to-depth packing of a resized uint8 image onto a zero-padded
// canvas, in one pass.
//
// The host input pipeline ships pixel canvases to the TPU in the
// space-to-depth layout ([H/2, W/2, 12] for RGB) so the stem's stride-2
// conv runs as a regrouped stride-1 conv with no on-device repacking
// transpose (see cap2det_tpu/models/inception_v2.py space_to_depth).
// Doing the pack in numpy costs ~10 ms per min-dim-1000 image (strided
// 6-D transpose); this kernel does it at memcpy speed (~1 ms) directly
// from the resized image, fusing away the intermediate [H, W, 3] canvas
// entirely.
//
// Layout contract (must match inception_v2.space_to_depth exactly):
//   dst[r, c, di*6 + dj*3 + ch] = src[2r+di, 2c+dj, ch]
// for 2r+di < nh and 2c+dj < nw; everything else is zero (canvas
// padding). nh/nw may be odd; ch2/cw2 are the packed canvas dims
// (canvas_h/2, canvas_w/2).
//
// The reference reader relied on tf.data's C++ decode/pad pipeline for
// this class of work (readers/cap2det_reader.py:213-267); this is the
// rebuild's native equivalent for the packing half.

#include <cstdint>
#include <cstring>

extern "C" {

int cap2det_pack_s2d_u8(const uint8_t* src, int nh, int nw,
                        uint8_t* dst, int ch2, int cw2) {
  if (nh < 0 || nw < 0 || ch2 <= 0 || cw2 <= 0) return -1;
  if (nh > 2 * ch2 || nw > 2 * cw2) return -1;

  const long dst_row = static_cast<long>(cw2) * 12;
  std::memset(dst, 0, static_cast<long>(ch2) * dst_row);

  const int full_r = nh / 2;   // rows with both di=0 and di=1 in range
  const int full_c = nw / 2;   // cols with both dj=0 and dj=1 in range
  const long src_row = static_cast<long>(nw) * 3;

  for (int r = 0; r < full_r; ++r) {
    const uint8_t* s0 = src + (2L * r) * src_row;
    const uint8_t* s1 = s0 + src_row;
    uint8_t* d = dst + r * dst_row;
    for (int c = 0; c < full_c; ++c) {
      // Two adjacent source pixels are 6 contiguous bytes.
      std::memcpy(d, s0 + 6L * c, 6);
      std::memcpy(d + 6, s1 + 6L * c, 6);
      d += 12;
    }
    if (nw & 1) {  // trailing odd column: dj=0 only
      std::memcpy(d, s0 + 6L * full_c, 3);
      std::memcpy(d + 6, s1 + 6L * full_c, 3);
    }
  }
  if (nh & 1) {  // trailing odd row: di=0 only
    const uint8_t* s0 = src + (2L * full_r) * src_row;
    uint8_t* d = dst + full_r * dst_row;
    for (int c = 0; c < full_c; ++c) {
      std::memcpy(d, s0 + 6L * c, 6);
      d += 12;
    }
    if (nw & 1) {
      std::memcpy(d, s0 + 6L * full_c, 3);
    }
  }
  return 0;
}

}  // extern "C"
