// OpenCV-4 compat shim: the reference includes <opencv2/highgui/highgui_c.h>
// for the OpenCV-2-era CV_LOAD_IMAGE_* constants, which OpenCV 4 moved to
// imgcodecs/legacy. This stub (stubs/ precedes the real include dirs)
// forwards to the modern location so the reference TUs compile unmodified.
#ifndef ORACLE_STUB_HIGHGUI_C_H_
#define ORACLE_STUB_HIGHGUI_C_H_

#include <opencv2/imgcodecs/legacy/constants_c.h>

#endif  // ORACLE_STUB_HIGHGUI_C_H_
