/* In-tree fake librtlsdr for driving the dlopen device backend end-to-end
 * without hardware (the pattern the reference's rtlsdr-handler loads at
 * runtime, devices/rtlsdr-handler/rtlsdr-handler.cpp:102-116).
 *
 * Behaviour:
 *   - device count from FAKE_RTLSDR_COUNT (default 1; 0 simulates "no
 *     dongle plugged in")
 *   - rtlsdr_read_async streams the u8 interleaved IQ file named by
 *     FAKE_RTLSDR_IQ through the callback in buf_len chunks, then returns
 *     (like a dongle unplugged at capture end); missing file -> zeros
 *   - setters record their last values (introspectable via the
 *     fake_rtlsdr_last_* exports, and validated simply by not failing)
 *
 * Build (tests do this): cc -shared -fPIC -o libfakertlsdr.so \
 *     fake_librtlsdr.c
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef void (*rtlsdr_read_async_cb_t)(unsigned char *buf, uint32_t len,
                                       void *ctx);

struct fake_dev {
  uint32_t rate;
  uint32_t freq;
  int gain_mode;
  int gain;
  int agc;
  int ppm;
  volatile int cancel;
};

static struct fake_dev g_dev;

uint32_t rtlsdr_get_device_count(void) {
  const char *c = getenv("FAKE_RTLSDR_COUNT");
  return c ? (uint32_t)atoi(c) : 1u;
}

const char *rtlsdr_get_device_name(uint32_t index) {
  (void)index;
  return "Fake RTL2838UHIDIR";
}

int rtlsdr_open(void **dev, uint32_t index) {
  if (index >= rtlsdr_get_device_count()) return -1;
  memset(&g_dev, 0, sizeof(g_dev));
  *dev = &g_dev;
  return 0;
}

int rtlsdr_close(void *dev) { (void)dev; return 0; }

int rtlsdr_set_sample_rate(void *dev, uint32_t rate) {
  ((struct fake_dev *)dev)->rate = rate;
  return 0;
}
int rtlsdr_set_center_freq(void *dev, uint32_t freq) {
  ((struct fake_dev *)dev)->freq = freq;
  return 0;
}
uint32_t rtlsdr_get_center_freq(void *dev) {
  return ((struct fake_dev *)dev)->freq;
}
int rtlsdr_set_tuner_gain_mode(void *dev, int manual) {
  ((struct fake_dev *)dev)->gain_mode = manual;
  return 0;
}
int rtlsdr_set_tuner_gain(void *dev, int gain) {
  ((struct fake_dev *)dev)->gain = gain;
  return 0;
}
int rtlsdr_set_agc_mode(void *dev, int on) {
  ((struct fake_dev *)dev)->agc = on;
  return 0;
}
int rtlsdr_set_freq_correction(void *dev, int ppm) {
  struct fake_dev *d = dev;
  if (d->ppm == ppm) return -2;     /* librtlsdr quirk: "already set" */
  d->ppm = ppm;
  return 0;
}
int rtlsdr_reset_buffer(void *dev) { (void)dev; return 0; }

uint32_t fake_rtlsdr_last_freq(void) { return g_dev.freq; }
int fake_rtlsdr_last_gain(void) { return g_dev.gain; }
int fake_rtlsdr_last_ppm(void) { return g_dev.ppm; }

int rtlsdr_read_async(void *dev, rtlsdr_read_async_cb_t cb, void *ctx,
                      uint32_t buf_num, uint32_t buf_len) {
  struct fake_dev *d = dev;
  (void)buf_num;
  if (buf_len == 0) buf_len = 262144;   /* librtlsdr default */
  unsigned char *buf = malloc(buf_len);
  if (!buf) return -1;
  d->cancel = 0;
  /* two payload modes:
   *   FAKE_RTLSDR_IQ      — one file, streamed once (EOF ends the stream,
   *                         like a dongle unplugged at capture end)
   *   FAKE_RTLSDR_IQ_DIR  — frequency-aware: stream <dir>/<freq>.u8 for
   *                         the currently tuned centre (switches between
   *                         chunks, loops at EOF, silence when no file) —
   *                         lets retune/band-scan paths run end-to-end */
  const char *path = getenv("FAKE_RTLSDR_IQ");
  const char *dir = getenv("FAKE_RTLSDR_IQ_DIR");
  FILE *f = (!dir && path) ? fopen(path, "rb") : NULL;
  uint32_t cur_freq = 0;
  int have_freq_file = 0;
  /* pace like real hardware: FAKE_RTLSDR_FPS frames/s (default the set
   * sample rate) — an unpaced dump would instantly overrun the consumer
   * ring, which is dongle-unlike */
  const char *fps_env = getenv("FAKE_RTLSDR_FPS");
  double fps = fps_env ? atof(fps_env) : (double)(d->rate ? d->rate : 2304000);
  while (!d->cancel) {
    size_t got;
    if (dir && (d->freq != cur_freq || (!f && !have_freq_file))) {
      if (f) fclose(f);
      char pathbuf[1024];
      snprintf(pathbuf, sizeof(pathbuf), "%s/%u.u8", dir, d->freq);
      f = fopen(pathbuf, "rb");
      cur_freq = d->freq;
      have_freq_file = 1;
    }
    if (f) {
      got = fread(buf, 1, buf_len, f);
      if (got == 0) {
        if (dir) {                      /* loop the tuned capture */
          rewind(f);
          continue;
        }
        break;                          /* capture over: stream ends */
      }
    } else {
      memset(buf, 127, buf_len);        /* no file: silence (DC) */
      got = buf_len;
    }
    cb(buf, (uint32_t)got, ctx);
    if (fps > 0) {
      double sec = (double)(got / 2) / fps;
      struct timespec ts;
      ts.tv_sec = (time_t)sec;
      ts.tv_nsec = (long)((sec - (double)ts.tv_sec) * 1e9);
      nanosleep(&ts, NULL);
    }
  }
  if (f) fclose(f);
  free(buf);
  return 0;
}

int rtlsdr_cancel_async(void *dev) {
  ((struct fake_dev *)dev)->cancel = 1;
  return 0;
}
