from pg_archiver_spark.archiver import main

raise SystemExit(main())
