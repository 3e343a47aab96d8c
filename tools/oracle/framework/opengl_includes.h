// Empty stand-in: the oracle build has no GL.
#pragma once
