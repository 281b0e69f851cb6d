/* In-tree fake libairspy for driving the second dlopen device backend
 * end-to-end without hardware (the library the reference's airspy-handler
 * loads at runtime, devices/airspy/airspy-handler.cpp:412-590).
 *
 * Behaviour:
 *   - airspy_open succeeds unless FAKE_AIRSPY_PRESENT=0 ("no device
 *     plugged in")
 *   - airspy_get_samplerates reports {10000000, 2500000} — negotiation
 *     (closest to 2 MS/s, airspy-handler.cpp:103-116) must pick 2500000
 *   - airspy_start_rx spawns a pthread (real libairspy owns the streaming
 *     thread) delivering INT16_IQ transfers from the file FAKE_AIRSPY_IQ,
 *     paced at FAKE_AIRSPY_FPS frames/s (default the set sample rate);
 *     loops at EOF like a signal generator unless FAKE_AIRSPY_LOOP=0, in
 *     which case a final sample_count==0 transfer marks end-of-capture
 *   - the callback returning nonzero stops streaming (the documented
 *     libairspy contract)
 *   - setters record their last values (fake_airspy_last_* exports)
 *
 * Build (tests do this): cc -shared -fPIC -O2 -o libfakeairspy.so \
 *     fake_libairspy.c -lpthread
 */

#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

/* exact vendor ABI (devices/airspy/libairspy/airspy.h:97-105) */
struct airspy_transfer {
  void *device;
  void *ctx;
  void *samples;
  int sample_count;
  uint64_t dropped_samples;
  int sample_type;
};
typedef int (*airspy_cb_t)(struct airspy_transfer *);

struct fake_airspy {
  uint32_t rate;
  uint32_t freq;
  int sample_type;
  int linearity, sensitivity, lna, vga, mixer;
  int lna_agc, mixer_agc;
  airspy_cb_t cb;
  void *cb_ctx;
  pthread_t thread;
  volatile int streaming;
};

static struct fake_airspy g_dev;

int airspy_init(void) { return 0; }
int airspy_exit(void) { return 0; }

int airspy_open(void **dev) {
  const char *p = getenv("FAKE_AIRSPY_PRESENT");
  if (p && atoi(p) == 0) return -5; /* AIRSPY_ERROR_NOT_FOUND */
  memset(&g_dev, 0, sizeof(g_dev));
  *dev = &g_dev;
  return 0;
}

int airspy_close(void *dev) { (void)dev; return 0; }

int airspy_set_sample_type(void *dev, int t) {
  ((struct fake_airspy *)dev)->sample_type = t;
  return 0;
}

int airspy_get_samplerates(void *dev, uint32_t *buffer, uint32_t len) {
  (void)dev;
  static const uint32_t rates[2] = {10000000u, 2500000u};
  if (len == 0) {
    *buffer = 2;
  } else {
    memcpy(buffer, rates, (len < 2 ? len : 2) * sizeof(uint32_t));
  }
  return 0;
}

int airspy_set_samplerate(void *dev, uint32_t rate) {
  ((struct fake_airspy *)dev)->rate = rate;
  return 0;
}

int airspy_set_freq(void *dev, uint32_t hz) {
  ((struct fake_airspy *)dev)->freq = hz;
  return 0;
}

#define GAIN_SETTER(name, field)                                            \
  int airspy_set_##name(void *dev, uint8_t v) {                             \
    ((struct fake_airspy *)dev)->field = v;                                 \
    return 0;                                                               \
  }
GAIN_SETTER(linearity_gain, linearity)
GAIN_SETTER(sensitivity_gain, sensitivity)
GAIN_SETTER(lna_gain, lna)
GAIN_SETTER(vga_gain, vga)
GAIN_SETTER(mixer_gain, mixer)
GAIN_SETTER(lna_agc, lna_agc)
GAIN_SETTER(mixer_agc, mixer_agc)

uint32_t fake_airspy_last_freq(void) { return g_dev.freq; }
uint32_t fake_airspy_last_rate(void) { return g_dev.rate; }
int fake_airspy_last_sample_type(void) { return g_dev.sample_type; }
int fake_airspy_last_linearity(void) { return g_dev.linearity; }
int fake_airspy_last_sensitivity(void) { return g_dev.sensitivity; }

static void *stream_main(void *arg) {
  struct fake_airspy *d = arg;
  enum { CHUNK = 8192 }; /* frames per transfer */
  int16_t *buf = malloc(CHUNK * 2 * sizeof(int16_t));
  const char *path = getenv("FAKE_AIRSPY_IQ");
  const char *loop_env = getenv("FAKE_AIRSPY_LOOP");
  int loop = loop_env ? atoi(loop_env) : 1;
  const char *fps_env = getenv("FAKE_AIRSPY_FPS");
  double fps = fps_env ? atof(fps_env) : (double)(d->rate ? d->rate : 2500000);
  FILE *f = path ? fopen(path, "rb") : NULL;
  while (d->streaming) {
    size_t got_frames;
    if (f) {
      got_frames = fread(buf, 2 * sizeof(int16_t), CHUNK, f);
      if (got_frames == 0) {
        if (loop) {
          rewind(f);
          continue;
        }
        break; /* capture over */
      }
    } else {
      memset(buf, 0, CHUNK * 2 * sizeof(int16_t)); /* no file: silence */
      got_frames = CHUNK;
    }
    struct airspy_transfer t = {d,   d->cb_ctx,     buf,
                                (int)got_frames, 0, d->sample_type};
    if (d->cb(&t) != 0) {
      d->streaming = 0;
      break;
    }
    if (fps > 0) {
      double sec = (double)got_frames / fps;
      struct timespec ts;
      ts.tv_sec = (time_t)sec;
      ts.tv_nsec = (long)((sec - (double)ts.tv_sec) * 1e9);
      nanosleep(&ts, NULL);
    }
  }
  if (d->streaming && d->cb) { /* end-of-capture marker (fake-only) */
    struct airspy_transfer t = {d, d->cb_ctx, buf, 0, 0, d->sample_type};
    d->cb(&t);
  }
  if (f) fclose(f);
  free(buf);
  return NULL;
}

int airspy_start_rx(void *dev, airspy_cb_t cb, void *ctx) {
  struct fake_airspy *d = dev;
  if (d->streaming) return -1;
  d->cb = cb;
  d->cb_ctx = ctx;
  d->streaming = 1;
  if (pthread_create(&d->thread, NULL, stream_main, d) != 0) {
    d->streaming = 0;
    return -1;
  }
  return 0;
}

int airspy_stop_rx(void *dev) {
  struct fake_airspy *d = dev;
  if (!d->streaming && !d->thread) return 0;
  d->streaming = 0;
  if (d->thread) {
    pthread_join(d->thread, NULL);
    d->thread = 0;
  }
  return 0;
}

const char *airspy_error_name(int err) {
  (void)err;
  return "fake airspy error";
}
