from canvas_tpu.pipeline.cli import main

raise SystemExit(main())
