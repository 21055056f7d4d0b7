// cvbackend.cpp — raw-pointer bridge into the modern system OpenCV (4.x).
//
// Compiled against the *system* opencv4 headers only (never the vendored
// 2.4.5 headers), so the two OpenCV C++ ABIs never meet in one translation
// unit.  Exposes plain-C entry points used by cv24abi.cpp.

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>

extern "C" void cvb_median_blur_u8(unsigned char *data, int rows, int cols,
                                   int channels, size_t step, int ksize) {
  cv::Mat view(rows, cols, CV_MAKETYPE(CV_8U, channels), data, step);
  cv::Mat tmp = view.clone();
  cv::medianBlur(tmp, tmp, ksize);
  tmp.copyTo(view);
}
