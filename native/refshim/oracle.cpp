// oracle.cpp — ctypes-friendly A/B oracle over the REAL card.io-dmz C++.
//
// Compiles the reference's unity build (dmz_all.cpp, CYTHON_DMZ=1,
// SCAN_EXPIRY=1 — the exact configuration of the reference's own research
// harness, cython_dmz/dmz.pyxbld) into this translation unit, so even
// DMZ_INTERNAL (static) stages are callable, and exposes a flat extern "C"
// surface for Python ctypes.  This fills the cython_dmz role (SURVEY §2.5,
// dmz.pyx:365-820): a compiled-reference oracle for parity measurement.
//
// The vendored OpenCV 2.4.5 C++ namespace is renamed to cv24 (see
// cv24abi.cpp); the legacy C API (cvCreateImage, cvSobel, ...) resolves
// against the system OpenCV 4.x libraries, which still ship it.

#include "dmz_all.cpp"

#include <cstring>

#define REF_MAX_GROUPS 12
#define REF_MAX_CHARS 48  // pre-filter local groups can span a full stripe (~428/9 rects)

extern "C" {

typedef struct {
  int32_t top, left, width, height, character_width, pattern;
  int32_t recently_seen_count, total_seen_count, n_chars;
  int32_t char_top[REF_MAX_CHARS], char_left[REF_MAX_CHARS];
  int64_t char_sum[REF_MAX_CHARS];
  float scores[11 * 10];  // kExpiryMaxValidLength x 10, row-major
} RefGroup;

typedef struct {
  float vseg_score;
  int32_t vseg_y_offset, vseg_pattern_type, vseg_number_length;
  int32_t hseg_n_offsets;
  int32_t hseg_offsets[16];
  float hseg_score, hseg_number_width;
  int32_t hseg_pattern_offset;
  float scores[160];  // 16 x 10 digit probabilities, row-major
  int32_t usable, upside_down;
  int32_t n_expiry_groups, n_name_groups;
  RefGroup expiry_groups[REF_MAX_GROUPS];
  RefGroup name_groups[REF_MAX_GROUPS];
} RefFrame;

}  // extern "C" (types)

// ---------------------------------------------------------------------------
// helpers

static IplImage *wrap_gray(const uint8_t *buf, int w, int h) {
  // Copy into a fresh IplImage so the reference can set ROIs / mutate freely.
  IplImage *img = cvCreateImage(cvSize(w, h), IPL_DEPTH_8U, 1);
  for (int r = 0; r < h; r++)
    memcpy(img->imageData + (size_t)r * img->widthStep, buf + (size_t)r * w, w);
  return img;
}

static void copy_group(const GroupedRects &g, RefGroup *out) {
  out->top = g.top;
  out->left = g.left;
  out->width = g.width;
  out->height = g.height;
  out->character_width = g.character_width;
  out->pattern = (int32_t)g.pattern;
  out->recently_seen_count = g.recently_seen_count;
  out->total_seen_count = g.total_seen_count;
  int n = (int)g.character_rects.size();
  if (n > REF_MAX_CHARS) n = REF_MAX_CHARS;
  out->n_chars = n;
  for (int i = 0; i < n; i++) {
    out->char_top[i] = g.character_rects[i].top;
    out->char_left[i] = g.character_rects[i].left;
    out->char_sum[i] = g.character_rects[i].sum;
  }
  for (int r = 0; r < kExpiryMaxValidLength; r++)
    for (int c = 0; c < 10; c++) out->scores[r * 10 + c] = g.scores(r, c);
}

static void copy_group_list(const GroupedRectsList &gl, RefGroup *out,
                            int32_t *n_out) {
  int n = (int)gl.size();
  if (n > REF_MAX_GROUPS) n = REF_MAX_GROUPS;
  *n_out = n;
  for (int i = 0; i < n; i++) copy_group(gl[i], &out[i]);
}

static GroupedRects group_from_ref(const RefGroup *in) {
  GroupedRects g;
  g.top = in->top;
  g.left = in->left;
  g.width = in->width;
  g.height = in->height;
  g.grouped_yet = false;
  g.sum = 0;
  g.character_width = in->character_width;
  g.pattern = (ExpiryPattern)in->pattern;
  g.recently_seen_count = in->recently_seen_count;
  g.total_seen_count = in->total_seen_count;
  g.scores = ExpiryGroupScores::Zero();
  for (int r = 0; r < kExpiryMaxValidLength; r++)
    for (int c = 0; c < 10; c++) g.scores(r, c) = in->scores[r * 10 + c];
  for (int i = 0; i < in->n_chars && i < REF_MAX_CHARS; i++)
    g.character_rects.push_back(
        CharacterRect(in->char_top[i], in->char_left[i], in->char_sum[i]));
  return g;
}

static void copy_frame_result(const FrameScanResult &r, RefFrame *out) {
  out->vseg_score = r.vseg.score;
  out->vseg_y_offset = r.vseg.y_offset;
  out->vseg_pattern_type = r.vseg.pattern_type;
  out->vseg_number_length = r.vseg.number_length;
  out->hseg_n_offsets = r.hseg.n_offsets;
  for (int i = 0; i < 16; i++) out->hseg_offsets[i] = r.hseg.offsets[i];
  out->hseg_score = r.hseg.score;
  out->hseg_number_width = r.hseg.number_width;
  out->hseg_pattern_offset = r.hseg.pattern_offset;
  for (int i = 0; i < 16; i++)
    for (int j = 0; j < 10; j++) out->scores[i * 10 + j] = r.scores(i, j);
  out->usable = r.usable ? 1 : 0;
  out->upside_down = r.upside_down ? 1 : 0;
  copy_group_list(r.expiry_groups, out->expiry_groups, &out->n_expiry_groups);
  copy_group_list(r.name_groups, out->name_groups, &out->n_name_groups);
}

static void init_frame_telemetry(FrameScanResult *r) {
  // Same stub telemetry the reference's own research harness uses
  // (scan/frame.cpp:84-98, cython_scan_card_image).
  r->focus_score = 666;
  r->brightness_score = 150;
  r->iso_speed = 400;
  r->shutter_speed = 5;
  r->torch_is_on = false;
  r->flipped = false;
  r->hseg.n_offsets = 0;
  memset(r->hseg.offsets, 0, sizeof(r->hseg.offsets));
  r->hseg.score = 0;
  r->hseg.number_width = 0;
  r->hseg.pattern_offset = 0;
  r->scores = NumberScores::Zero();
}

// ---------------------------------------------------------------------------
// public surface

extern "C" {

// Single-frame scan of a rectified 428x270 Y image (scan/frame.cpp:24-81).
void ref_scan_card_image(const uint8_t *y, int collect_number, int scan_expiry,
                         RefFrame *out) {
  IplImage *img = wrap_gray(y, kCreditCardTargetWidth, kCreditCardTargetHeight);
  FrameScanResult r;
  init_frame_telemetry(&r);
  scan_card_image(img, collect_number != 0, scan_expiry != 0, &r);
  copy_frame_result(r, out);
  cvReleaseImage(&img);
}

// Session API (scan/scan.cpp).
void *ref_scanner_create(void) {
  ScannerState *st = new ScannerState();
  scanner_initialize(st);
  return st;
}

void ref_scanner_destroy(void *s) {
  ScannerState *st = (ScannerState *)s;
  scanner_destroy(st);
  delete st;
}

void ref_scanner_add_frame(void *s, const uint8_t *y, int scan_expiry,
                           RefFrame *out) {
  ScannerState *st = (ScannerState *)s;
  IplImage *img = wrap_gray(y, kCreditCardTargetWidth, kCreditCardTargetHeight);
  FrameScanResult r;
  init_frame_telemetry(&r);
  scanner_add_frame_with_expiry(st, img, scan_expiry != 0, &r);
  copy_frame_result(r, out);
  cvReleaseImage(&img);
}

int ref_scanner_result(void *s, int32_t preds[16], int32_t *n_numbers,
                       int32_t *month, int32_t *year) {
  ScannerState *st = (ScannerState *)s;
  ScannerResult res;
  scanner_result(st, &res);
  if (!res.complete) return 0;
  *n_numbers = res.n_numbers;
  for (int i = 0; i < 16; i++) preds[i] = (int32_t)res.predictions(i);
  *month = res.expiry_month;
  *year = res.expiry_year;
  return 1;
}

// Read back the session's aggregated expiry state (for A/B of aggregation).
void ref_scanner_expiry_groups(void *s, RefGroup *groups, int32_t *n,
                               int32_t *month, int32_t *year) {
  ScannerState *st = (ScannerState *)s;
  copy_group_list(st->expiry_groups, groups, n);
  *month = st->expiry_month;
  *year = st->expiry_year;
}

// Stage: vertical segmentation only (scan/n_vseg.cpp:94-168).
void ref_vseg(const uint8_t *y, RefFrame *out) {
  IplImage *img = wrap_gray(y, kCreditCardTargetWidth, kCreditCardTargetHeight);
  NVerticalSegmentation v = best_n_vseg(img);
  out->vseg_score = v.score;
  out->vseg_y_offset = v.y_offset;
  out->vseg_pattern_type = v.pattern_type;
  out->vseg_number_length = v.number_length;
  cvReleaseImage(&img);
}

// Stage: horizontal segmentation on the 428x27 strip at y_offset, given the
// vseg outcome (scan/n_hseg.cpp:88-152).
void ref_hseg(const uint8_t *y, int y_offset, RefFrame *out) {
  IplImage *img = wrap_gray(y, kCreditCardTargetWidth, kCreditCardTargetHeight);
  NVerticalSegmentation v = best_n_vseg(img);
  v.y_offset = (uint16_t)y_offset;
  cvSetImageROI(img, cvRect(0, y_offset, kCreditCardTargetWidth, kNumberHeight));
  NHorizontalSegmentation h = best_n_hseg(img, v);
  out->hseg_n_offsets = h.n_offsets;
  for (int i = 0; i < 16; i++) out->hseg_offsets[i] = h.offsets[i];
  out->hseg_score = h.score;
  out->hseg_number_width = h.number_width;
  out->hseg_pattern_offset = h.pattern_offset;
  cvReleaseImage(&img);
}

// Stage: expiry segmentation (scan/expiry_seg.cpp:706-902).
void ref_expiry_seg(const uint8_t *y, int y_offset, RefFrame *out) {
  IplImage *img = wrap_gray(y, kCreditCardTargetWidth, kCreditCardTargetHeight);
  GroupedRectsList expiry_groups, name_groups;
  best_expiry_seg(img, (uint16_t)y_offset, expiry_groups, name_groups);
  copy_group_list(expiry_groups, out->expiry_groups, &out->n_expiry_groups);
  copy_group_list(name_groups, out->name_groups, &out->n_name_groups);
  cvReleaseImage(&img);
}

// Stage: categorize + aggregate expiry groups across frames
// (scan/expiry_categorize.cpp:448-501).  old/new group lists are passed and
// returned flat; *n_old is updated to the new aggregated state size.
void ref_expiry_extract(const uint8_t *y, RefGroup *old_groups, int32_t *n_old,
                        const RefGroup *new_groups, int32_t n_new,
                        int32_t *month, int32_t *year) {
  IplImage *img = wrap_gray(y, kCreditCardTargetWidth, kCreditCardTargetHeight);
  GroupedRectsList state_groups, fresh_groups;
  for (int i = 0; i < *n_old; i++) state_groups.push_back(group_from_ref(&old_groups[i]));
  for (int i = 0; i < n_new; i++) fresh_groups.push_back(group_from_ref(&new_groups[i]));
  int m = 0, yr = 0;
  expiry_extract(img, state_groups, fresh_groups, &m, &yr);
  copy_group_list(state_groups, old_groups, n_old);
  *month = m;
  *year = yr;
  cvReleaseImage(&img);
}

// Stage: categorize one group's digits in isolation
// (scan/expiry_categorize.cpp, expiry_extract_group — CYTHON_DMZ surface).
void ref_expiry_extract_group(const uint8_t *y, RefGroup *group,
                              int32_t *month, int32_t *year) {
  IplImage *img = wrap_gray(y, kCreditCardTargetWidth, kCreditCardTargetHeight);
  GroupedRects g = group_from_ref(group);
  ExpiryGroupScores old_scores = ExpiryGroupScores::Zero();
  int m = 0, yr = 0;
  expiry_extract_group(img, g, old_scores, &m, &yr);
  copy_group(g, group);
  *month = m;
  *year = yr;
  cvReleaseImage(&img);
}

// Edge detection on full camera planes (dmz.cpp:371-439).
// rho_theta: [top, left, bottom, right] x (rho, theta); found: 4 flags;
// corners: tl,tr,bl,br x (x, y).  Returns 1 if the card was detected.
int ref_detect_edges(const uint8_t *y, int yw, int yh, const uint8_t *cb,
                     const uint8_t *cr, int cw, int ch, int orientation,
                     float rho_theta[8], int32_t found[4], float corners[8]) {
  IplImage *iy = wrap_gray(y, yw, yh);
  IplImage *icb = wrap_gray(cb, cw, ch);
  IplImage *icr = wrap_gray(cr, cw, ch);
  dmz_edges edges;
  dmz_corner_points pts;
  bool ok = dmz_detect_edges(iy, icb, icr, (FrameOrientation)orientation,
                             &edges, &pts);
  const dmz_found_edge *fe[4] = {&edges.top, &edges.left, &edges.bottom,
                                 &edges.right};
  for (int i = 0; i < 4; i++) {
    found[i] = fe[i]->found;
    rho_theta[2 * i] = fe[i]->location.rho;
    rho_theta[2 * i + 1] = fe[i]->location.theta;
  }
  corners[0] = pts.top_left.x;
  corners[1] = pts.top_left.y;
  corners[2] = pts.top_right.x;
  corners[3] = pts.top_right.y;
  corners[4] = pts.bottom_left.x;
  corners[5] = pts.bottom_left.y;
  corners[6] = pts.bottom_right.x;
  corners[7] = pts.bottom_right.y;
  cvReleaseImage(&iy);
  cvReleaseImage(&icb);
  cvReleaseImage(&icr);
  return ok ? 1 : 0;
}

// Perspective rectification (dmz.cpp:443-497).  corners as in
// ref_detect_edges; out is 428x270 tight-packed.
void ref_transform_card(const uint8_t *sample, int w, int h,
                        const float corners[8], int orientation, int upsample,
                        uint8_t *out) {
  dmz_context *dmz = dmz_context_create();
  IplImage *img = wrap_gray(sample, w, h);
  dmz_corner_points pts;
  pts.top_left.x = corners[0];
  pts.top_left.y = corners[1];
  pts.top_right.x = corners[2];
  pts.top_right.y = corners[3];
  pts.bottom_left.x = corners[4];
  pts.bottom_left.y = corners[5];
  pts.bottom_right.x = corners[6];
  pts.bottom_right.y = corners[7];
  IplImage *transformed = NULL;
  dmz_transform_card(dmz, img, pts, (FrameOrientation)orientation,
                     upsample != 0, &transformed);
  for (int r = 0; r < kCreditCardTargetHeight; r++)
    memcpy(out + (size_t)r * kCreditCardTargetWidth,
           transformed->imageData + (size_t)r * transformed->widthStep,
           kCreditCardTargetWidth);
  cvReleaseImage(&transformed);
  cvReleaseImage(&img);
  dmz_context_destroy(dmz);
}

// Homography solve alone (llcv_calc_persp_transform, cv/warp.cpp:34-125):
// the Eigen f32 householderQr 8x8 path.  Points packed (x0,y0,...,x3,y3);
// out = row-major 3x3.
void ref_persp_transform(const float src_pts[8], const float dst_pts[8],
                         float out[9]) {
  dmz_point sp[4], dp[4];
  for (int i = 0; i < 4; i++) {
    sp[i].x = src_pts[2 * i];
    sp[i].y = src_pts[2 * i + 1];
    dp[i].x = dst_pts[2 * i];
    dp[i].y = dst_pts[2 * i + 1];
  }
  llcv_calc_persp_transform(out, 9, true, sp, dp);
}

// Raw cvWarpPerspective INTER_LINEAR + FILL_OUTLIERS with a given
// row-major src->dst f32 matrix — the warp half of llcv_unwarp
// (cv/warp.cpp:158-166) with the matrix held fixed, for isolating
// interpolation parity from homography parity.
void ref_warp_perspective(const uint8_t *input, int w, int h,
                          const float matrix[9], int out_w, int out_h,
                          uint8_t *out) {
  IplImage *img = wrap_gray(input, w, h);
  IplImage *o = cvCreateImage(cvSize(out_w, out_h), IPL_DEPTH_8U, 1);
  CvMat *m = cvCreateMat(3, 3, CV_32FC1);
  for (int r = 0; r < 3; r++)
    for (int c = 0; c < 3; c++)
      CV_MAT_ELEM(*m, float, r, c) = matrix[3 * r + c];
  cvWarpPerspective(img, o, m, CV_INTER_LINEAR + CV_WARP_FILL_OUTLIERS,
                    cvScalarAll(0));
  for (int r = 0; r < out_h; r++)
    memcpy(out + (size_t)r * out_w, o->imageData + (size_t)r * o->widthStep,
           out_w);
  cvReleaseMat(&m);
  cvReleaseImage(&o);
  cvReleaseImage(&img);
}

float ref_focus_score(const uint8_t *y, int w, int h, int use_full_image) {
  IplImage *img = wrap_gray(y, w, h);
  float s = dmz_focus_score(img, use_full_image != 0);
  cvReleaseImage(&img);
  return s;
}

float ref_brightness_score(const uint8_t *y, int w, int h, int use_full_image) {
  IplImage *img = wrap_gray(y, w, h);
  float s = dmz_brightness_score(img, use_full_image != 0);
  cvReleaseImage(&img);
  return s;
}

// --------------------------- kernel-level oracles --------------------------
// For root-causing stage divergences down to individual llcv kernels.

// 7x7 Sobel (cv/sobel.cpp:500-530): u8 in, s16 out, dx xor dy.
void ref_sobel7(const uint8_t *src, int w, int h, int dx, int16_t *out) {
  IplImage *s = wrap_gray(src, w, h);
  IplImage *d = cvCreateImage(cvSize(w, h), IPL_DEPTH_16S, 1);
  IplImage *scratch = cvCreateImage(cvSize(w, h), IPL_DEPTH_16S, 1);
  llcv_sobel7(s, d, scratch, dx != 0, dx == 0);
  for (int r = 0; r < h; r++)
    memcpy(out + (size_t)r * w, d->imageData + (size_t)r * d->widthStep,
           w * sizeof(int16_t));
  cvReleaseImage(&scratch);
  cvReleaseImage(&d);
  cvReleaseImage(&s);
}

// Adaptive Canny 7 with precomputed sobel (cv/canny.cpp:568).
void ref_canny7(const uint8_t *src, int w, int h, uint8_t *out) {
  IplImage *s = wrap_gray(src, w, h);
  IplImage *dx = cvCreateImage(cvSize(w, h), IPL_DEPTH_16S, 1);
  IplImage *dy = cvCreateImage(cvSize(w, h), IPL_DEPTH_16S, 1);
  IplImage *scratch = cvCreateImage(cvSize(w, h), IPL_DEPTH_16S, 1);
  IplImage *d = cvCreateImage(cvSize(w, h), IPL_DEPTH_8U, 1);
  llcv_sobel7(s, dx, scratch, true, false);
  llcv_sobel7(s, dy, scratch, false, true);
  llcv_adaptive_canny7_precomputed_sobel(s, d, dx, dy);
  for (int r = 0; r < h; r++)
    memcpy(out + (size_t)r * w, d->imageData + (size_t)r * d->widthStep, w);
  cvReleaseImage(&d);
  cvReleaseImage(&scratch);
  cvReleaseImage(&dy);
  cvReleaseImage(&dx);
  cvReleaseImage(&s);
}

// Gradient-gated Hough (cv/hough.cpp:52-195) on a canny image + sobel planes.
// Returns (rho, theta, is_null) packed into out[3].
void ref_hough(const uint8_t *canny, const int16_t *dx, const int16_t *dy,
               int w, int h, float rho_res, float theta_res, int threshold,
               float theta_min, float theta_max, int vertical,
               float gradient_angle_threshold, float out[3]) {
  IplImage *c = wrap_gray(canny, w, h);
  IplImage *idx = cvCreateImage(cvSize(w, h), IPL_DEPTH_16S, 1);
  IplImage *idy = cvCreateImage(cvSize(w, h), IPL_DEPTH_16S, 1);
  for (int r = 0; r < h; r++) {
    memcpy(idx->imageData + (size_t)r * idx->widthStep, dx + (size_t)r * w,
           w * sizeof(int16_t));
    memcpy(idy->imageData + (size_t)r * idy->widthStep, dy + (size_t)r * w,
           w * sizeof(int16_t));
  }
  CvLinePolar line = llcv_hough(c, idx, idy, rho_res, theta_res, threshold,
                                theta_min, theta_max, vertical != 0,
                                gradient_angle_threshold);
  out[0] = line.rho;
  out[1] = line.angle;
  out[2] = line.is_null ? 1.0f : 0.0f;
  cvReleaseImage(&idy);
  cvReleaseImage(&idx);
  cvReleaseImage(&c);
}

// 1-D / 2-D-cross morphological gradient (cv/morph.cpp).
void ref_morph_grad3(const uint8_t *src, int w, int h, int two_d,
                     uint8_t *out) {
  IplImage *s = wrap_gray(src, w, h);
  IplImage *d = cvCreateImage(cvSize(w, h), IPL_DEPTH_8U, 1);
  if (two_d)
    llcv_morph_grad3_2d_cross_u8(s, d);
  else
    llcv_morph_grad3_1d_u8(s, d);
  for (int r = 0; r < h; r++)
    memcpy(out + (size_t)r * w, d->imageData + (size_t)r * d->widthStep, w);
  cvReleaseImage(&d);
  cvReleaseImage(&s);
}

// Histogram equalization (cv/stats.cpp:116).
void ref_equalize_hist(const uint8_t *src, int w, int h, uint8_t *out) {
  IplImage *s = wrap_gray(src, w, h);
  IplImage *d = cvCreateImage(cvSize(w, h), IPL_DEPTH_8U, 1);
  llcv_equalize_hist(s, d);
  for (int r = 0; r < h; r++)
    memcpy(out + (size_t)r * w, d->imageData + (size_t)r * d->widthStep, w);
  cvReleaseImage(&d);
  cvReleaseImage(&s);
}

// Scharr-3 |dx| or |dy| (cv/sobel.cpp:810,905): u8 -> s16.
void ref_scharr3_abs(const uint8_t *src, int w, int h, int is_dx,
                     int16_t *out) {
  IplImage *s = wrap_gray(src, w, h);
  IplImage *d = cvCreateImage(cvSize(w, h), IPL_DEPTH_16S, 1);
  if (is_dx)
    llcv_scharr3_dx_abs(s, d);
  else
    llcv_scharr3_dy_abs(s, d);
  for (int r = 0; r < h; r++)
    memcpy(out + (size_t)r * w, d->imageData + (size_t)r * d->widthStep,
           w * sizeof(int16_t));
  cvReleaseImage(&d);
  cvReleaseImage(&s);
}

// ---------------------- expiry-seg stage-level oracles ---------------------
// Direct access to the reference's own static stage functions so each stage
// of the host/device expiry pipeline can be A/B'd with controlled inputs.

static IplImage *wrap_s16(const int16_t *buf, int w, int h) {
  IplImage *img = cvCreateImage(cvSize(w, h), IPL_DEPTH_16S, 1);
  for (int r = 0; r < h; r++)
    memcpy(img->imageData + (size_t)r * img->widthStep, buf + (size_t)r * w,
           w * sizeof(int16_t));
  return img;
}

// The scharr/sobel image exactly as best_expiry_seg computes it
// (expiry_seg.cpp:714-739: zeroed full-card image, ROI'd scharr below the
// PAN row).
void ref_expiry_sobel(const uint8_t *y, int y_offset, int16_t *out) {
  IplImage *img = wrap_gray(y, kCreditCardTargetWidth, kCreditCardTargetHeight);
  IplImage *sobel = cvCreateImage(cvGetSize(img), IPL_DEPTH_16S, 1);
  cvSetZero(sobel);
  CvRect below = cvRect(0, y_offset + kNumberHeight, kCreditCardTargetWidth,
                        kCreditCardTargetHeight - (y_offset + kNumberHeight));
  cvSetImageROI(img, below);
  cvSetImageROI(sobel, below);
  llcv_scharr3_dx_abs(img, sobel);
  cvResetImageROI(sobel);
  for (int r = 0; r < kCreditCardTargetHeight; r++)
    memcpy(out + (size_t)r * kCreditCardTargetWidth,
           sobel->imageData + (size_t)r * sobel->widthStep,
           kCreditCardTargetWidth * sizeof(int16_t));
  cvReleaseImage(&sobel);
  cvReleaseImage(&img);
}

// The reference's find_character_groups_for_stripe on a caller-provided
// sobel image (expiry_seg.cpp:386-704).
void ref_find_character_groups(const int16_t *sobel, int base_row,
                               int64_t stripe_sum, RefGroup *expiry_out,
                               int32_t *n_expiry, RefGroup *name_out,
                               int32_t *n_name) {
  IplImage *simg = wrap_s16(sobel, kCreditCardTargetWidth, kCreditCardTargetHeight);
  GroupedRectsList expiry_groups, name_groups;
  find_character_groups_for_stripe(NULL, simg, base_row, (long)stripe_sum,
                                   expiry_groups, name_groups);
  copy_group_list(expiry_groups, expiry_out, n_expiry);
  copy_group_list(name_groups, name_out, n_name);
  cvReleaseImage(&simg);
}

// regrid_group (expiry_seg.cpp:174-241) on a caller-provided group.
void ref_regrid_group(const int16_t *sobel, RefGroup *group) {
  IplImage *simg = wrap_s16(sobel, kCreditCardTargetWidth, kCreditCardTargetHeight);
  GroupedRects g = group_from_ref(group);
  regrid_group(simg, g);
  copy_group(g, group);
  cvReleaseImage(&simg);
}

// optimize_character_rects (expiry_seg.cpp:243-343).
void ref_optimize_character_rects(const int16_t *sobel, RefGroup *group) {
  IplImage *simg = wrap_s16(sobel, kCreditCardTargetWidth, kCreditCardTargetHeight);
  GroupedRects g = group_from_ref(group);
  optimize_character_rects(simg, g);
  copy_group(g, group);
  cvReleaseImage(&simg);
}

// is_slash (expiry_seg.cpp:50-54); returns P(slash).
float ref_slash_prob(const int16_t *sobel, int top, int left) {
  IplImage *simg = wrap_s16(sobel, kCreditCardTargetWidth, kCreditCardTargetHeight);
  IplImage *as_float = cvCreateImage(
      cvSize(kTrimmedCharacterImageWidth, kTrimmedCharacterImageHeight),
      IPL_DEPTH_32F, 1);
  CharacterRect rect(top, left, 0);
  prepare_image_for_seg(simg, as_float, &rect);
  SlashProbabilities probs = slash_probabilities(as_float);
  cvReleaseImage(&as_float);
  cvReleaseImage(&simg);
  return probs(0, 0);
}

// gather_into_groups (expiry_seg.cpp:135-172) over caller-provided GROUPS
// (with character rects) — the super-group gather the reference carries
// disabled at expiry_seg.cpp:548 (tolerance 2 * kSmallCharacterWidth).
void ref_gather_groups(const RefGroup *in, int n, int tolerance,
                       RefGroup *out, int32_t *n_out) {
  GroupedRectsList items;
  for (int i = 0; i < n; i++) items.push_back(group_from_ref(&in[i]));
  GroupedRectsList groups;
  gather_into_groups(groups, items, tolerance);
  copy_group_list(groups, out, n_out);
}

// gather_into_groups (expiry_seg.cpp:135-172) over bare 9x17 rects.
void ref_gather_into_groups(const int32_t *tops, const int32_t *lefts,
                            const int64_t *sums, int n, int tolerance,
                            RefGroup *out, int32_t *n_out) {
  GroupedRectsList items;
  for (int i = 0; i < n; i++) {
    GroupedRects r;
    r.top = tops[i];
    r.left = lefts[i];
    r.width = kSmallCharacterWidth;
    r.height = kSmallCharacterHeight + 2;
    r.grouped_yet = false;
    r.sum = (long)sums[i];
    r.character_width = kSmallCharacterWidth;
    items.push_back(r);
  }
  GroupedRectsList groups;
  gather_into_groups(groups, items, tolerance);
  copy_group_list(groups, out, n_out);
}

// prepare_image_for_cat (expiry_categorize.cpp:37-73): morph-grad ->
// equalize -> 3x3 bilateral -> f32, on the 11x16 char at (top, left).
void ref_expiry_prep_char(const uint8_t *y, int top, int left, float *out) {
  IplImage *img = wrap_gray(y, kCreditCardTargetWidth, kCreditCardTargetHeight);
  IplImage *as_float = cvCreateImage(
      cvSize(kTrimmedCharacterImageWidth, kTrimmedCharacterImageHeight),
      IPL_DEPTH_32F, 1);
  CharacterRectList rects;
  rects.push_back(CharacterRect(top, left, 0));
  prepare_image_for_cat(img, as_float, rects.begin());
  for (int r = 0; r < kTrimmedCharacterImageHeight; r++)
    memcpy(out + (size_t)r * kTrimmedCharacterImageWidth,
           as_float->imageData + (size_t)r * as_float->widthStep,
           kTrimmedCharacterImageWidth * sizeof(float));
  cvReleaseImage(&as_float);
  cvReleaseImage(&img);
}

// Per-model inference oracles, straight from the generated C++ (models/).
void ref_model_vseg(const float *input204, float *out3) {
  Eigen::Matrix<float, 1, 204, Eigen::RowMajor> in;
  for (int i = 0; i < 204; i++) in(0, i) = input204[i];
  Eigen::Matrix<float, 1, 3, Eigen::RowMajor> out = applym_befe75da(in);
  for (int i = 0; i < 3; i++) out3[i] = out(0, i);
}

void ref_model_pan(int which, const float *input27x19, float *out10) {
  Eigen::Matrix<float, 27, 19, Eigen::RowMajor> in;
  for (int r = 0; r < 27; r++)
    for (int c = 0; c < 19; c++) in(r, c) = input27x19[r * 19 + c];
  Eigen::Matrix<float, 1, 10, Eigen::RowMajor> out;
  if (which == 0)
    out = applyc_5c241121(in);
  else if (which == 1)
    out = applyc_01266c1b(in);
  else
    out = applyc_b00bf70c(in);
  for (int i = 0; i < 10; i++) out10[i] = out(0, i);
}

void ref_model_slash(const float *input176, float *out2) {
  Eigen::Matrix<float, 1, 176, Eigen::RowMajor> in;
  for (int i = 0; i < 176; i++) in(0, i) = input176[i];
  Eigen::Matrix<float, 1, 2, Eigen::RowMajor> out = applym_730c4cbd(in);
  for (int i = 0; i < 2; i++) out2[i] = out(0, i);
}

void ref_model_expiry(const float *input16x11, float *out10) {
  Eigen::Matrix<float, 16, 11, Eigen::RowMajor> in;
  for (int r = 0; r < 16; r++)
    for (int c = 0; c < 11; c++) in(r, c) = input16x11[r * 11 + c];
  Eigen::Matrix<float, 1, 10, Eigen::RowMajor> out = applyc_bf4dd6c8(in);
  for (int i = 0; i < 10; i++) out10[i] = out(0, i);
}

// Generated-model self-checks (models/*.cpp pass* functions).
int ref_models_selfcheck(void) {
  return (passm_befe75da() && passc_5c241121() && passc_01266c1b() &&
          passc_b00bf70c() && passm_730c4cbd() && passc_bf4dd6c8())
             ? 1
             : 0;
}

}  // extern "C"
