// Shim for the reference's "radio.h": the RDS sources include it only to
// name the RadioInterface their (no-op-shimmed) signal connections point
// at (e.g. /root/reference/src/rds/rds-blocksynchronizer.cpp:32-42).
// This shim must come FIRST on the include path so the real Qt-heavy
// /root/reference/radio.h is never seen.
#pragma once

class RadioInterface {};
