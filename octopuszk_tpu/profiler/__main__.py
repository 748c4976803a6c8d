from octopuszk_tpu.profiler.profiler import main
import sys
sys.exit(main())
