// cv24abi.cpp — minimal implementations of the OpenCV-2.4 C++ symbols that
// the card.io-dmz reference sources pull in via its vendored 2.4.5 headers.
//
// The whole reference is compiled with `-Dcv=cv24`, which renames the vendored
// `namespace cv` to `cv24`.  That lets us link the reference's legacy C++ ABI
// (Mat layout with an inline refcount, 2.4-era _InputArray, ...) side by side
// with the system OpenCV 4.x shared libraries that provide the legacy *C* API
// (cvCreateImage, cvSobel, cvMorphologyEx, ...) without any symbol collision.
//
// Only the symbols the reference actually references are implemented:
//   cv::Mat::Mat(const IplImage*, bool)   (dmz.cpp:510, dmz_blur_card)
//   cv::medianBlur                        (dmz.cpp:511)
//   cv::Mat::deallocate, cv::fastFree     (Mat::release path)
//   cv::error, cv::Exception::*           (CV_Assert / CV_Error plumbing)
//   cv::_InputArray/_OutputArray ctors + getMat/getMatRef (medianBlur call)
//
// This file is compiled with -Dcv=cv24 and -I/root/reference so that it sees
// exactly the same (renamed) vendored headers as the reference sources.

#include "opencv2/core/core.hpp"

#include <cstdio>
#include <cstdlib>
#include <cstring>

// Raw-pointer delegation into the modern system OpenCV (see cvbackend.cpp).
extern "C" void cvb_median_blur_u8(unsigned char *data, int rows, int cols,
                                   int channels, size_t step, int ksize);

namespace cv /* == cv24 via -Dcv=cv24 */ {

void fastFree(void *ptr) {
  if (ptr) {
    // Matches OpenCV's fastMalloc scheme (original pointer stashed just before
    // the aligned block).  Nothing in our build path allocates through
    // fastMalloc, so this is defensive only.
    uchar *udata = ((uchar **)ptr)[-1];
    free(udata);
  }
}

void Mat::deallocate() { fastFree(datastart); }

void error(const Exception &exc) {
  fprintf(stderr, "cv24 error: %s (%s:%d)\n", exc.err.c_str(),
          exc.file.c_str(), exc.line);
  abort();
}

Exception::Exception() : code(0), line(0) {}

Exception::Exception(int _code, const string &_err, const string &_func,
                     const string &_file, int _line)
    : code(_code), err(_err), func(_func), file(_file), line(_line) {
  formatMessage();
}

Exception::~Exception() throw() {}

const char *Exception::what() const throw() { return msg.c_str(); }

void Exception::formatMessage() { msg = err; }

_InputArray::_InputArray(const Mat &m) : flags(MAT), obj((void *)&m) {}
_OutputArray::_OutputArray(Mat &m) : _InputArray(m) {}

Mat _InputArray::getMat(int) const { return *(const Mat *)obj; }
Mat &_OutputArray::getMatRef(int) const { return *(Mat *)obj; }

// Remaining 2.4 _InputArray/_OutputArray virtuals (needed so the vtables
// emit).  Only the MAT kind ever occurs in the reference's call sites.
void _InputArray::getMatVector(vector<Mat> &) const { abort(); }
int _InputArray::kind() const { return flags & KIND_MASK; }
Size _InputArray::size(int) const { return ((const Mat *)obj)->size(); }
size_t _InputArray::total(int) const { return ((const Mat *)obj)->total(); }
int _InputArray::type(int) const { return ((const Mat *)obj)->type(); }
int _InputArray::depth(int) const { return ((const Mat *)obj)->depth(); }
int _InputArray::channels(int) const { return ((const Mat *)obj)->channels(); }
bool _InputArray::empty() const { return ((const Mat *)obj)->empty(); }

bool _OutputArray::fixedSize() const { return (flags & FIXED_SIZE) != 0; }
bool _OutputArray::fixedType() const { return (flags & FIXED_TYPE) != 0; }
bool _OutputArray::needed() const { return kind() != NONE; }
void _OutputArray::create(Size, int, int, bool, int) const { abort(); }
void _OutputArray::create(int, int, int, int, bool, int) const { abort(); }
void _OutputArray::create(int, const int *, int, int, bool, int) const {
  abort();
}
void _OutputArray::release() const { abort(); }
void _OutputArray::clear() const { abort(); }

// 2-D-only copySize (called from the inline Mat copy constructor).
void Mat::copySize(const Mat &m) {
  if (m.dims > 2) abort();
  dims = m.dims;
  rows = m.rows;
  cols = m.cols;
  step[0] = m.step[0];
  step[1] = m.step[1];
}

// 2.4-faithful Mat-from-IplImage header constructor (2.4 matrix.cpp).  Only
// the copyData=false path is supported (the only one the reference uses).
Mat::Mat(const IplImage *img, bool copyData)
    : flags(MAGIC_VAL), dims(2), rows(img->height), cols(img->width),
      data((uchar *)img->imageData), refcount(0),
      datastart((uchar *)img->imageData), dataend(0), datalimit(0),
      allocator(0), size(&rows) {
  int imgdepth = IPL2CV_DEPTH(img->depth);
  size_t esz;
  step[0] = (size_t)img->widthStep;

  if (!img->roi) {
    flags = MAGIC_VAL + CV_MAKETYPE(imgdepth, img->nChannels);
    esz = CV_ELEM_SIZE(flags);
  } else {
    flags = MAGIC_VAL + CV_MAKETYPE(imgdepth, img->nChannels);
    rows = img->roi->height;
    cols = img->roi->width;
    esz = CV_ELEM_SIZE(flags);
    data = datastart = (uchar *)img->imageData + img->roi->yOffset * step.p[0] +
                       img->roi->xOffset * esz;
  }
  datalimit = datastart + step.p[0] * rows;
  dataend = datastart + step.p[0] * (rows - 1) + esz * cols;
  flags |= ((size_t)cols * esz == step.p[0] || rows == 1 ? CONTINUOUS_FLAG : 0);
  step[1] = esz;

  if (copyData) {
    fprintf(stderr, "cv24: Mat(IplImage, copyData=true) unsupported\n");
    abort();
  }
}

// Delegates to the modern OpenCV medianBlur through a raw-pointer bridge.  The
// reference's only call site blurs an 8U RGB(A) ROI in place (dmz.cpp:510-511).
void medianBlur(InputArray _src, OutputArray _dst, int ksize) {
  Mat src = _src.getMat();
  Mat &dst = _dst.getMatRef();
  CV_Assert(src.depth() == CV_8U && src.data == dst.data);
  cvb_median_blur_u8(src.data, src.rows, src.cols, src.channels(), src.step.p[0],
                     ksize);
}

}  // namespace cv

// The GL/GPU virtuals return types that are only forward-declared in the
// vendored headers, so they cannot be defined normally.  They are pure
// vtable filler (never called on the MAT kind); satisfy the linker with raw
// mangled-name stubs.
extern "C" {
void _ZNK4cv2411_InputArray11getGlBufferEv(void) { abort(); }
void _ZNK4cv2411_InputArray12getGlTextureEv(void) { abort(); }
void _ZNK4cv2411_InputArray9getGpuMatEv(void) { abort(); }
}
