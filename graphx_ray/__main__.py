from graphx_ray.cli import main

raise SystemExit(main())
