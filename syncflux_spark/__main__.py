from syncflux_spark.cli import main

raise SystemExit(main())
