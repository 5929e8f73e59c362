// Confusion-matrix accumulation kernel for pixel-level semantic evaluation.
//
// Capability twin of the reference's Cython/C kernel
// (data_api/cityscapes_scripts/evaluation/addToConfusionMatrix.pyx + _impl.c):
// accumulate per-pixel (prediction, groundtruth) label pairs into a
// [num_classes, num_classes] uint64 matrix. Exposed via a C ABI for ctypes.

#include <cstdint>

extern "C" {

// prediction, groundtruth: [n] uint8 label images (flattened).
// conf_matrix: [num_classes * num_classes] uint64, row = groundtruth,
// col = prediction (matches the official Cityscapes toolkit layout).
void add_to_confusion_matrix(const uint8_t *prediction,
                             const uint8_t *groundtruth, int64_t n,
                             uint64_t num_classes, uint64_t *conf_matrix) {
  for (int64_t i = 0; i < n; ++i) {
    conf_matrix[(uint64_t)groundtruth[i] * num_classes + prediction[i]] += 1;
  }
}

}  // extern "C"
