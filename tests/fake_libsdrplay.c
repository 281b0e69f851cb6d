/* In-tree fake libsdrplay_api for driving the fourth dlopen backend
 * end-to-end without hardware (the service API the reference's
 * sdrplay-handler-v3 resolves at runtime,
 * devices/sdrplay-handler-v3/sdrplay-handler-v3.cpp:818-930).
 *
 * Behaviour:
 *   - one RSP1A (hwVer 255) unless FAKE_SDRPLAY_PRESENT=0
 *   - GetDeviceParams returns a static param tree with the vendor
 *     defaults; Update() records the reason mask + the current params
 *     (fake_sdrplay_last_* exports) — the backend must edit-then-commit
 *     like the reference's Rsp-device does
 *   - Init spawns a pthread delivering PLANAR short samples (separate
 *     xi/xq arrays, the real service's convention) from the interleaved
 *     i16 file FAKE_SDRPLAY_IQ, paced at FAKE_SDRPLAY_FPS frames/s
 *     (default fsHz); loops at EOF unless FAKE_SDRPLAY_LOOP=0 (then one
 *     final numSamples==0 callback marks end-of-capture)
 *   - Uninit stops the stream thread
 *
 * Layout comes from runtime/native/sdrplay_abi.h — the same transcribed
 * v3.06 ABI the backend compiles against.
 *
 * Build (tests do this): cc -shared -fPIC -O2 -I../sdrjfm_tpu/runtime/native \
 *     -o libfakesdrplay.so fake_libsdrplay.c -lpthread
 */

#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "sdrplay_abi.h"

static sdrjfm_sdrplay_DevParamsT g_dev_params;
static sdrjfm_sdrplay_RxChannelParamsT g_ch_a;
static sdrjfm_sdrplay_DeviceParamsT g_params = {&g_dev_params, &g_ch_a, 0};

static sdrjfm_sdrplay_CallbackFnsT g_cbs;
static void *g_cb_ctx;
static pthread_t g_thread;
static volatile int g_streaming = 0;
static int g_api_open = 0;
static unsigned int g_last_update_reason = 0;
static int g_selected = 0;

int sdrplay_api_Open(void) { g_api_open = 1; return 0; }
int sdrplay_api_Close(void) { g_api_open = 0; return 0; }
int sdrplay_api_ApiVersion(float *v) { *v = 3.06f; return 0; }
int sdrplay_api_LockDeviceApi(void) { return 0; }
int sdrplay_api_UnlockDeviceApi(void) { return 0; }

int sdrplay_api_GetDevices(sdrjfm_sdrplay_DeviceT *devs,
                           unsigned int *ndev, unsigned int max) {
  const char *p = getenv("FAKE_SDRPLAY_PRESENT");
  if ((p && atoi(p) == 0) || max == 0) {
    *ndev = 0;
    return 0;
  }
  memset(&devs[0], 0, sizeof(devs[0]));
  snprintf(devs[0].SerNo, SDRJFM_SDRPLAY_MAX_SER_NO_LEN, "FAKE-RSP1A-0001");
  devs[0].hwVer = (unsigned char)255;   /* SDRPLAY_RSP1A_ID */
  devs[0].tuner = sdrjfm_sdrplay_Tuner_A;
  devs[0].dev = (sdrplay_HANDLE)&g_params;
  *ndev = 1;
  return 0;
}

int sdrplay_api_SelectDevice(sdrjfm_sdrplay_DeviceT *dev) {
  (void)dev;
  /* vendor defaults (sdrplay_api_dev.h / _tuner.h / _control.h) */
  memset(&g_dev_params, 0, sizeof(g_dev_params));
  memset(&g_ch_a, 0, sizeof(g_ch_a));
  g_dev_params.fsFreq.fsHz = 2000000.0;
  g_ch_a.tunerParams.bwType = 200;
  g_ch_a.tunerParams.ifType = 0;
  g_ch_a.tunerParams.loMode = 1;
  g_ch_a.tunerParams.gain.gRdB = 50;
  g_ch_a.tunerParams.rfFreq.rfHz = 200000000.0;
  g_ch_a.ctrlParams.agc.enable = 2; /* AGC_50HZ default */
  g_selected = 1;
  return 0;
}

int sdrplay_api_ReleaseDevice(sdrjfm_sdrplay_DeviceT *dev) {
  (void)dev;
  g_selected = 0;
  return 0;
}

const char *sdrplay_api_GetErrorString(int err) {
  (void)err;
  return "fake sdrplay error";
}

int sdrplay_api_GetDeviceParams(sdrplay_HANDLE h,
                                sdrjfm_sdrplay_DeviceParamsT **out) {
  (void)h;
  *out = &g_params;
  return 0;
}

/* introspection for tests */
double fake_sdrplay_last_fs(void) { return g_dev_params.fsFreq.fsHz; }
double fake_sdrplay_last_rf(void) {
  return g_ch_a.tunerParams.rfFreq.rfHz;
}
int fake_sdrplay_last_grdb(void) { return g_ch_a.tunerParams.gain.gRdB; }
int fake_sdrplay_last_lna(void) {
  return g_ch_a.tunerParams.gain.LNAstate;
}
int fake_sdrplay_last_agc(void) { return g_ch_a.ctrlParams.agc.enable; }
int fake_sdrplay_last_bw(void) { return g_ch_a.tunerParams.bwType; }
unsigned int fake_sdrplay_last_update_reason(void) {
  return g_last_update_reason;
}

static void *stream_main(void *arg) {
  (void)arg;
  enum { CHUNK = 2016 }; /* frames per callback (service-typical size) */
  int16_t *inter = malloc(CHUNK * 2 * sizeof(int16_t));
  short *xi = malloc(CHUNK * sizeof(short));
  short *xq = malloc(CHUNK * sizeof(short));
  const char *path = getenv("FAKE_SDRPLAY_IQ");
  const char *loop_env = getenv("FAKE_SDRPLAY_LOOP");
  int loop = loop_env ? atoi(loop_env) : 1;
  const char *fps_env = getenv("FAKE_SDRPLAY_FPS");
  double fps = fps_env ? atof(fps_env) : g_dev_params.fsFreq.fsHz;
  FILE *f = path ? fopen(path, "rb") : NULL;
  sdrjfm_sdrplay_StreamCbParamsT prm;
  memset(&prm, 0, sizeof(prm));
  while (g_streaming) {
    size_t got;
    if (f) {
      got = fread(inter, 2 * sizeof(int16_t), CHUNK, f);
      if (got == 0) {
        if (loop) {
          rewind(f);
          continue;
        }
        break;
      }
    } else {
      memset(inter, 0, CHUNK * 2 * sizeof(int16_t));
      got = CHUNK;
    }
    for (size_t i = 0; i < got; i++) { /* planar delivery */
      xi[i] = inter[2 * i];
      xq[i] = inter[2 * i + 1];
    }
    prm.numSamples = (unsigned int)got;
    g_cbs.StreamACbFn(xi, xq, &prm, (unsigned int)got, 0, g_cb_ctx);
    if (fps > 0) {
      double sec = (double)got / fps;
      struct timespec ts;
      ts.tv_sec = (time_t)sec;
      ts.tv_nsec = (long)((sec - (double)ts.tv_sec) * 1e9);
      nanosleep(&ts, NULL);
    }
  }
  if (g_streaming && g_cbs.StreamACbFn) { /* end-of-capture marker */
    prm.numSamples = 0;
    g_cbs.StreamACbFn(xi, xq, &prm, 0, 0, g_cb_ctx);
  }
  if (f) fclose(f);
  free(inter);
  free(xi);
  free(xq);
  return NULL;
}

int sdrplay_api_Init(sdrplay_HANDLE h, sdrjfm_sdrplay_CallbackFnsT *cbs,
                     void *ctx) {
  (void)h;
  if (g_streaming) return 9; /* AlreadyInitialised */
  g_cbs = *cbs;
  g_cb_ctx = ctx;
  g_streaming = 1;
  if (pthread_create(&g_thread, NULL, stream_main, NULL) != 0) {
    g_streaming = 0;
    return 1;
  }
  return 0;
}

int sdrplay_api_Uninit(sdrplay_HANDLE h) {
  (void)h;
  if (!g_streaming && !g_thread) return 0;
  g_streaming = 0;
  if (g_thread) {
    pthread_join(g_thread, NULL);
    g_thread = 0;
  }
  return 0;
}

int sdrplay_api_Update(sdrplay_HANDLE h, int tuner, int reason, int ext1) {
  (void)h;
  (void)tuner;
  (void)ext1;
  g_last_update_reason |= (unsigned int)reason;
  return 0;
}
